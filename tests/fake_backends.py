"""Fake "real" codec backends for the drop-in seam tests: stand-ins for
pdfminer.six / cv2 with the exact signatures the seam expects, importable
by Spark workers (module:function specs)."""

from __future__ import annotations


def parse_pdf(payload: bytes) -> list[tuple[int, str]]:
    """bytes → [(page_no, text)], the pdfminer-shaped contract."""
    body = payload.decode("utf-8", errors="replace")
    return [(1, f"REALPDF page1 {body[-12:]}"), (2, "REALPDF page2")]


def decode_audio(payload: bytes):
    """bytes → (sample_rate, samples), the librosa-shaped contract."""
    return 22050, [1, -2, 3]


def decode_image(payload: bytes) -> dict:
    """bytes → feature dict, the cv2/PIL-shaped contract."""
    return {
        "format": "real-img",
        "width": 1024,
        "height": 768,
        "phash": "feedfacefeedface",
        "ocr_text": f"REALOCR {payload.decode('utf-8', errors='replace')[-8:]}",
    }
