"""F4 photo-likeness + F5 textless-figure gate (reference
figure_ocr.py:127-138, 24-25, 254-259) over deterministic SPM rasters."""

import numpy as np
import pytest

from pdf_extraction_spark.functions.raster import (
    decode_spm,
    encode_spm,
    is_photo_like,
    photo_metrics,
)
from pdf_extraction_spark.operators.multimodal import (
    photo_likeness,
    textless_figure_filter,
)


def _noise_img(seed: int, size: int = 96) -> bytes:
    """Colorful noise: many distinct colors, high saturation -> photo."""
    rng = np.random.default_rng(seed)
    return encode_spm(rng.integers(0, 256, (size, size, 3), dtype=np.uint8))


def _flat_img(r: int, g: int, b: int, size: int = 96) -> bytes:
    px = np.zeros((size, size, 3), dtype=np.uint8)
    px[:, :] = (r, g, b)
    return encode_spm(px)


def test_codec_roundtrip_and_guards():
    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    assert (decode_spm(encode_spm(px)) == px).all()
    with pytest.raises(ValueError):
        decode_spm(b"JPEG not really")
    with pytest.raises(ValueError):
        decode_spm(encode_spm(px)[:-1])  # truncated


def test_photo_rule_matches_reference_thresholds():
    # flat saturated color: 1 distinct color -> color_ratio tiny -> chart
    assert not is_photo_like(_flat_img(200, 30, 30))
    # colorful noise: thousands of colors, high saturation -> photo
    assert is_photo_like(_noise_img(7))
    # grayscale noise: many colors but saturation 0 -> not photo
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (96, 96, 1), dtype=np.uint8)
    gray = encode_spm(np.repeat(g, 3, axis=2))
    cr, sm = photo_metrics(decode_spm(gray))
    assert sm == 0.0  # zero saturation regardless of color count
    assert not is_photo_like(gray)
    assert not is_photo_like(b"")  # decode failure -> False


def test_photo_likeness_and_textless_gate_spark(spark):
    media = spark.createDataFrame(
        [
            (1, _noise_img(1)),    # photo
            (2, _flat_img(10, 200, 10)),  # chart-like
            (3, b"broken"),        # undecodable
        ],
        "media_id long, data binary",
    )
    photo = photo_likeness(media)
    got = {r.media_id: r for r in photo.collect()}
    assert got[1].photo_like and not got[2].photo_like and not got[3].photo_like
    assert got[3].color_ratio is None

    figures = spark.createDataFrame(
        [
            (1, ""),               # textless photo -> skip
            (2, ""),               # textless chart -> keep (not photo)
            (3, "매출 2024 chart"),  # has text -> keep
        ],
        "media_id long, description string",
    )
    out = {r.media_id: r for r in textless_figure_filter(figures, photo).collect()}
    assert out[1].skip and not out[1].has_text
    assert not out[2].skip
    assert not out[3].skip and out[3].has_text


def test_render_pages_rasterizes_blocks(spark):
    """S3 render: block boxes become ink in an SPM raster with the PDF
    y-flip; pages without geometry render null."""
    from pdf_extraction_spark.operators.extract import extract_stage
    from pdf_extraction_spark.operators.multimodal import render_pages
    from pdf_extraction_spark.sources.corpus import corpus_df

    pages = extract_stage(corpus_df(spark, 30)).filter("page_no > 0")
    rendered = {(r.url, r.page_no): r for r in render_pages(pages).collect()}
    assert rendered
    spdf = [r for r in rendered.values() if r.image is not None]
    html = [r for r in rendered.values() if r.image is None]
    assert spdf and html  # both payload kinds present in the corpus
    r = max(spdf, key=lambda x: x.ink_ratio)
    px = decode_spm(bytes(r.image))
    assert px.shape == (r.height, r.width, 3)
    dark = (px < 128).all(axis=2).mean()
    assert abs(dark - r.ink_ratio) < 0.05
    assert 0.01 < r.ink_ratio < 0.9
    # deterministic: re-render yields identical bytes
    again = {(x.url, x.page_no): x for x in render_pages(pages).collect()}
    assert bytes(again[(r.url, r.page_no)].image) == bytes(r.image)


def test_resize_images(spark):
    import numpy as np

    from pdf_extraction_spark.operators.multimodal import resize_images

    rng = np.random.default_rng(5)
    big = encode_spm(rng.integers(0, 256, (128, 200, 3), dtype=np.uint8))
    media = spark.createDataFrame(
        [(1, big), (2, b"junk")], "media_id long, data binary"
    )
    got = {r.media_id: r for r in resize_images(media, size=64).collect()}
    px = decode_spm(bytes(got[1].data))
    assert px.shape == (64, 64, 3)
    assert got[2].data is None


def test_figures_path_textless_photo_gate(spark):
    """F4+F5 wired into the figures path: pipeline doc_figures join a
    media table of figure rasters -> photo classifier -> skip decision
    (reference figure_ocr.py:254-259 --skip-textless flow)."""
    import numpy as np
    from pyspark.sql import functions as F

    from pdf_extraction_spark.operators import regions
    from pdf_extraction_spark.operators.extract import extract_stage
    from pdf_extraction_spark.operators.multimodal import (
        photo_likeness,
        textless_figure_filter,
    )
    from pdf_extraction_spark.sources.corpus import corpus_df

    figs = regions.doc_figures(
        extract_stage(corpus_df(spark, 40)).filter("page_no > 0")
    ).withColumn(
        "media_id", F.xxhash64("url", "page_no", "figure_index")
    )
    rows = figs.select("media_id").collect()
    assert rows
    # deterministic per-figure rasters: alternate photo-noise / flat
    rng = np.random.default_rng(9)
    media = []
    for i, r in enumerate(rows):
        if i % 2 == 0:
            px = rng.integers(0, 256, (80, 80, 3), dtype=np.uint8)
        else:
            px = np.full((80, 80, 3), (30, 180, 30), dtype=np.uint8)
        media.append((r.media_id, encode_spm(px)))
    media_df = spark.createDataFrame(media, "media_id long, data binary")

    gated = textless_figure_filter(
        figs, photo_likeness(media_df), text_col="description"
    )
    got = gated.collect()
    assert got
    for r in got:
        # skip iff textless AND photo-like, exactly the reference rule
        assert r.skip == ((not r.has_text) and bool(r.photo_like))
    # corpus figures carry FIG: descriptions -> most have text
    assert any(r.has_text for r in got)
