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


def page_count(payload: bytes) -> int:
    """Number of pages without materializing page text (cf. the reference's
    get_page_count, which re-rasterizes the whole file just to count —
    src/processors/pdf_processor.py:104-121; we scan headers instead)."""
    if not payload or not payload.startswith(MAGIC):
        return 0
    return sum(1 for line in payload.decode("utf-8").splitlines() if line.startswith("PAGE "))
