"""PDF layout parsing — pdfminer-style text-run ordering (north rule).

The reference rasterizes PDFs with poppler at 300 dpi and OCRs them
(/root/reference/src/processors/pdf_processor.py:36-71); the north rule
replaces that with direct layout parsing of text runs.  Since neither
poppler nor pdfminer is guaranteed in this sandbox (SURVEY.md §7.3), the
engine defines a deterministic synthetic layout format, **SPDF**, whose
payloads the tests synthesize; the parser below implements the same
reading-order algorithm pdfminer applies to real PDFs (group runs into
lines by y, order lines top-to-bottom — PDF y grows upward — and runs
left-to-right within a line).

SPDF payload (utf-8 bytes)::

    SPDF1
    PAGE <page_no>
    RUN <x> <y> <text with \\xNN escapes for newline/backslash>
    ...

Runs may appear in any order; parsing must be order-insensitive.  A real
PDF backend (pdfminer.six) drops in behind :func:`parse_pages` WITHOUT
any pipeline change: non-SPDF payloads dispatch to a pluggable backend
``module:function`` resolved (in the worker, where decoding happens)
from the Spark job's local property ``ocr_spark.pdf_backend`` — set via
:func:`set_pdf_backend`, propagated per-job to every task by Spark — or
the ``OCR_SPARK_PDF_BACKEND`` env var; absent both, a clear
``NotImplementedError``.  The seam is proven by tests/test_codec_seam.py
(a fake "real" backend injected end-to-end through the full pipeline).
"""

from __future__ import annotations

import importlib
import os
from typing import Callable, Iterable

MAGIC = b"SPDF1"
LINE_Y_TOLERANCE = 2.0  # runs within this y-distance share a line

BACKEND_PROP = "ocr_spark.pdf_backend"
BACKEND_ENV = "OCR_SPARK_PDF_BACKEND"


def set_pdf_backend(spark, spec: str | None) -> None:
    """Driver-side: route non-SPDF payloads of subsequent jobs to
    ``module:function`` (bytes → [(page_no, text)]); None clears it."""
    spark.sparkContext.setLocalProperty(BACKEND_PROP, spec)


def resolve_backend(prop: str, env: str) -> Callable | None:
    """Worker-side backend lookup: the job's local property (visible via
    TaskContext inside tasks) wins over the environment variable."""
    spec = None
    try:  # inside a task
        from pyspark import TaskContext

        ctx = TaskContext.get()
        if ctx is not None:
            spec = ctx.getLocalProperty(prop)
    except Exception:
        pass
    spec = spec or os.environ.get(env)
    if not spec:
        return None
    mod, _, fn = spec.partition(":")
    return getattr(importlib.import_module(mod), fn)


def _escape(text: str) -> str:
    return text.replace("\\", "\\x5c").replace("\n", "\\x0a")


def _unescape(text: str) -> str:
    return text.replace("\\x0a", "\n").replace("\\x5c", "\\")


def build_payload(pages: Iterable[Iterable[tuple[float, float, str]]]) -> bytes:
    """Assemble an SPDF payload from per-page (x, y, text) runs."""
    out = [MAGIC.decode()]
    for page_no, runs in enumerate(pages, start=1):
        out.append(f"PAGE {page_no}")
        for x, y, text in runs:
            out.append(f"RUN {x:g} {y:g} {_escape(text)}")
    return ("\n".join(out) + "\n").encode("utf-8")


def parse_pages(payload: bytes) -> list[tuple[int, str]]:
    """Parse an SPDF payload → [(page_no, page_text)] in page order.

    Reading order per page: lines sorted by descending y (PDF origin is
    bottom-left), runs within a line sorted by x, joined by single spaces;
    lines joined by newlines — the pdfminer convention.
    """
    if not payload or not payload.startswith(MAGIC):
        backend = resolve_backend(BACKEND_PROP, BACKEND_ENV)
        if backend is not None:
            return [(int(p), str(t)) for p, t in backend(payload)]
        raise NotImplementedError(
            "non-SPDF payload: register a real-PDF backend (pdfminer.six) "
            f"via {BACKEND_PROP} / ${BACKEND_ENV}"
        )
    pages: dict[int, list[tuple[float, float, str]]] = {}
    current = 0
    for raw in payload.decode("utf-8").splitlines()[1:]:
        if raw.startswith("PAGE "):
            current = int(raw[5:])
            pages.setdefault(current, [])
        elif raw.startswith("RUN "):
            x_s, y_s, text = raw[4:].split(" ", 2)
            pages.setdefault(current, []).append((float(x_s), float(y_s), _unescape(text)))

    out: list[tuple[int, str]] = []
    for page_no in sorted(pages):
        runs = sorted(pages[page_no], key=lambda r: (-r[1], r[0]))
        lines: list[list[tuple[float, float, str]]] = []
        for run in runs:
            if lines and abs(lines[-1][0][1] - run[1]) <= LINE_Y_TOLERANCE:
                lines[-1].append(run)
            else:
                lines.append([run])
        text = "\n".join(" ".join(r[2] for r in line) for line in lines)
        out.append((page_no, text))
    return out


# Synthetic word-geometry convention for SPDF/FAKEIMG payloads (a real
# OCR backend supplies true pixel boxes through the words seam below):
# monospace CHAR_W per character, LINE_H tall lines.
CHAR_W = 8.0
LINE_H = 16.0
WORD_LEVEL = 5  # tesseract hierarchy level for words (ocr_engine.py:174)

WORDS_BACKEND_PROP = "ocr_spark.words_backend"
WORDS_BACKEND_ENV = "OCR_SPARK_WORDS_BACKEND"


def _word_conf(word: str) -> float:
    """Deterministic stand-in for the tesseract per-word confidence
    (data['conf'] — src/ocr/ocr_engine.py:165-168): md5-derived in
    [0.50, 0.99] so the reference's threshold gate stays exercisable."""
    import hashlib

    h = int(hashlib.md5(word.lower().encode()).hexdigest()[:4], 16)
    return 0.5 + (h % 50) / 100.0


def _run_words(text: str, run_x: float, y: float, line_id: int, page_no: int,
               word_no_start: int) -> list[dict]:
    """Split one text run into word rows with monospace char geometry:
    bbox = (x0, top, x1, bottom) like the reference's
    (left, top, left+width, top+height) tuple (ocr_engine.py:169-175)."""
    import re

    rows = []
    for i, m in enumerate(re.finditer(r"\S+", text)):
        rows.append(
            {
                "page_no": page_no,
                "line_id": line_id,
                "word_no": word_no_start + i,
                "word": m.group(0),
                "conf": _word_conf(m.group(0)),
                "x0": run_x + CHAR_W * m.start(),
                "y0": y,
                "x1": run_x + CHAR_W * m.end(),
                "y1": y + LINE_H,
                "level": WORD_LEVEL,
            }
        )
    return rows


def parse_words(payload: bytes) -> list[dict]:
    """SPDF payload → word rows in reading order, reproducing the
    reference's structured OCR output (OCRResult.word_confidences /
    bounding_boxes and the words/lines dict of extract_structured_data —
    src/ocr/ocr_engine.py:18-24,154-191): one row per word with a
    deterministic confidence, a bbox, the tesseract word level, and the
    AR1 line grouping (line_id = index of the line in reading order).

    Reading order is EXACTLY parse_pages' (same line grouping and sort),
    so ``' '.join(words of a line)`` reassembles the page text lines.
    Non-SPDF payloads dispatch to a pluggable words backend
    (``module:function`` → list of word dicts) via the seam props, like
    parse_pages' text backend.
    """
    if not payload or not payload.startswith(MAGIC):
        backend = resolve_backend(WORDS_BACKEND_PROP, WORDS_BACKEND_ENV)
        if backend is not None:
            return list(backend(payload))
        raise NotImplementedError(
            "non-SPDF payload: register a real words backend (tesseract "
            f"image_to_data) via {WORDS_BACKEND_PROP} / ${WORDS_BACKEND_ENV}"
        )
    pages: dict[int, list[tuple[float, float, str]]] = {}
    current = 0
    for raw in payload.decode("utf-8").splitlines()[1:]:
        if raw.startswith("PAGE "):
            current = int(raw[5:])
            pages.setdefault(current, [])
        elif raw.startswith("RUN "):
            x_s, y_s, text = raw[4:].split(" ", 2)
            pages.setdefault(current, []).append((float(x_s), float(y_s), _unescape(text)))

    out: list[dict] = []
    for page_no in sorted(pages):
        runs = sorted(pages[page_no], key=lambda r: (-r[1], r[0]))
        lines: list[list[tuple[float, float, str]]] = []
        for run in runs:
            if lines and abs(lines[-1][0][1] - run[1]) <= LINE_Y_TOLERANCE:
                lines[-1].append(run)
            else:
                lines.append([run])
        word_no = 0
        for line_id, line in enumerate(lines):
            for x, y, text in line:
                rows = _run_words(text, x, y, line_id, page_no, word_no)
                word_no += len(rows)
                out.extend(rows)
    return out


def words_from_text(text: str) -> list[dict]:
    """Word rows for plain OCR'd text (the FAKEIMG image-stub path): each
    text line becomes one synthetic-geometry line at y = -line_idx·LINE_H
    (reading order preserved under the descending-y sort convention)."""
    out: list[dict] = []
    word_no = 0
    for line_id, line in enumerate((text or "").splitlines()):
        rows = _run_words(line, 0.0, -line_id * LINE_H, line_id, 1, word_no)
        word_no += len(rows)
        out.extend(rows)
    return out


def page_count(payload: bytes) -> int:
    """Number of pages without materializing page text (cf. the reference's
    get_page_count, which re-rasterizes the whole file just to count —
    src/processors/pdf_processor.py:104-121; we scan headers instead)."""
    if not payload or not payload.startswith(MAGIC):
        return 0
    return sum(1 for line in payload.decode("utf-8").splitlines() if line.startswith("PAGE "))
