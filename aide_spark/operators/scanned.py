"""Scanned-document operators: embedded-image extraction + fixed-font OCR
as partition-parallel Spark dataflow.

The reference routes scanned statements to a cloud OCR service and then
runs the SAME line parsers on the recognized text
(`/root/reference/api/lambdas/pdf_validator.py` scanned classification →
textract path). Here the whole leg is from scratch and local:
:func:`pdf_codec.extract_pdf_images` walks each document's image XObjects
through the in-repo codec family (Flate/raw bitmaps, DCTDecode via the
from-scratch JPEG decoder), and :mod:`operators.ocr` recognizes
machine-printed fixed-pitch pages by nearest-template matching.

Both operators are ``mapInPandas`` fan-outs over the binary payload column
— Arrow-batched, zero shuffle, decode parallelism = partition parallelism:
the identical scale shape as :mod:`operators.multimodal`. Undecodable
payloads emit nothing (quarantine-by-absence, the codec-family
convention)."""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("page", IntegerType(), False),
        StructField("name", StringType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("bits", IntegerType(), False),
        StructField("colorspace", StringType(), False),
        StructField("codec", StringType(), False),
        StructField("mean_luma", DoubleType(), True),
    ]
)


def pdf_image_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(doc_id, PDF payload) → one row per embedded image XObject with its
    decoded dimensions and mean luminance (``sum(samples) / (n·255)``,
    rounded to 6 — exact integer sums, one float division, so a SQL oracle
    can pin the values). Images whose filter needs a native decoder
    (CCITT/JBIG2/JPX) keep their codec label with NULL ``mean_luma``."""
    import pandas as pd

    from ..sources.pdf_codec import extract_pdf_images

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf[payload_col]):
                imgs = extract_pdf_images(bytes(b) if b is not None else b"")
                if imgs is None:
                    continue
                for im in imgs:
                    px = im["pixels"]
                    mean = (
                        round(sum(px) / (len(px) * 255.0), 6)
                        if px else None
                    )
                    rows.append(
                        (int(doc_id), im["page"], im["name"], im["width"],
                         im["height"], im["bits"], im["colorspace"],
                         im["codec"], mean)
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_SCHEMA.fields])

    return df.mapInPandas(batches, schema=IMAGE_SCHEMA)


OCR_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("page", IntegerType(), False),
        StructField("line_no", IntegerType(), False),
        StructField("line", StringType(), False),
    ]
)


def ocr_scanned_lines(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(doc_id, scanned-PDF payload) → recognized text lines, one row per
    non-empty line, ordered by (page, line_no). Grayscale embedded images
    run through :func:`ocr.ocr_gray`; color or undecodable pages emit
    nothing. Downstream feeds these lines to the SAME parser expressions as
    the text path — that equivalence is the whole point of the scanned
    branch (``e2e_scanned_ocr_extract``)."""
    import pandas as pd

    from ..sources.pdf_codec import extract_pdf_images
    from .ocr import ocr_gray

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf[payload_col]):
                imgs = extract_pdf_images(bytes(b) if b is not None else b"")
                if imgs is None:
                    continue
                for im in imgs:
                    if im["pixels"] is None or im["colorspace"] != "gray":
                        continue
                    lines = ocr_gray(im["width"], im["height"], im["pixels"])
                    for ln_no, ln in enumerate(lines):
                        if ln:
                            rows.append((int(doc_id), im["page"], ln_no, ln))
            yield pd.DataFrame(rows, columns=[f.name for f in OCR_SCHEMA.fields])

    return df.mapInPandas(batches, schema=OCR_SCHEMA)


def _invert_bytes(bm: bytes) -> bytes:
    import numpy as np

    return (np.frombuffer(bm, dtype=np.uint8) ^ 0xFF).tobytes()


def render_scanned_pdf(
    lines: list[str], page_size: int = 40, filter: str = "flate"
) -> bytes:
    """Text lines → a real scanned-statement PDF: pages of ≤ ``page_size``
    lines rendered in the 5×7 matrix font, embedded as 1-bit
    ``/DeviceGray`` image XObjects — ``filter='flate'`` (ink = sample 0,
    dark text on white, scanner polarity) or ``'ccitt'`` (Group 4 fax via
    the from-scratch T.6 coder, ink = G4 black). Test/fixture generator
    for the OCR path; the inverse of :func:`ocr_scanned_lines`."""
    from ..sources.pdf_codec import encode_pdf
    from .ocr import render_page

    spans = []
    images: dict[str, dict] = {}
    for p_i in range(0, max(len(lines), 1), page_size):
        if p_i:
            from ..schemas import PAGE_BREAK

            spans.append(("text", PAGE_BREAK, "", len(spans)))
        name = f"scan_p{p_i // page_size}"
        w, h, bm = render_page(lines[p_i : p_i + page_size])
        images[name] = {
            "width": w, "height": h, "colorspace": "gray", "bits": 1,
            "filter": filter,
            # G4 codes ink directly; 1-bit samples are inverse polarity
            # (vectorized byte-invert — same bytes as the per-byte XOR)
            "data": bm if filter == "ccitt" else _invert_bytes(bm),
        }
        spans.append(("media", "", name, len(spans)))
    return encode_pdf(spans, images=images)
