"""Multimodal plumbing tests: binary schema, mapInPandas batch flow."""

import pytest
from pyspark.sql import functions as F

from hbase_gis_spark.operators.multimodal import (
    attach_fake_media,
    decode_media,
    frame_sample,
)
from hbase_gis_spark.sources.tables import load_table
from tests.conftest import SF0001


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF0001, "documents").withColumnRenamed(
        "doc_id", "id"
    )
    return attach_fake_media(docs).cache()


def test_media_schema(media):
    fields = dict(media.dtypes)
    assert fields["media"] == "binary"
    assert fields["media_meta"].startswith("struct<mime:string,n_bytes:bigint")
    r = media.select("media_meta.n_bytes", F.length("media").alias("l")).first()
    assert r.n_bytes == r.l


def test_decode_media_deterministic(media):
    out = decode_media(media, fake=True)
    rows = out.collect()
    assert len(rows) == media.count()
    r = {x.id: x for x in rows}
    again = {x.id: x for x in decode_media(media, fake=True).collect()}
    sample = list(r)[:20]
    assert all(
        (r[i].width, r[i].height, r[i].mean_byte)
        == (again[i].width, again[i].height, again[i].mean_byte)
        for i in sample
    )
    assert all(1 <= r[i].width <= 64 for i in sample)


def test_decode_media_real_path_guarded(media):
    """Without an image library the real path must fail loudly with
    NotImplementedError (never silently fall back to the fake)."""
    from hbase_gis_spark.operators.multimodal import _HAS_PIL

    if _HAS_PIL:
        pytest.skip("PIL present; real path covered by the _real tests")
    with pytest.raises(Exception) as ei:
        decode_media(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def _png_bytes(w: int, h: int, value: int) -> bytes:
    """Uniform-gray RGB PNG via PIL (caller guarantees PIL exists)."""
    import io

    from PIL import Image

    im = Image.new("RGB", (w, h), (value, value, value))
    out = io.BytesIO()
    im.save(out, format="PNG")
    return out.getvalue()


def test_decode_media_real_kernel(spark):
    """Real PIL decode: exact (width, height, channels) and the pixel
    mean of a uniform image. Skips where the container lacks PIL — the
    kernel itself is exercised wherever PIL exists."""
    pytest.importorskip("PIL")
    rows = [(1, _png_bytes(5, 7, 100)), (2, _png_bytes(3, 2, 0))]
    df = spark.createDataFrame(rows, "id bigint, media binary")
    got = {r.id: r for r in decode_media(df, fake=False).collect()}
    assert (got[1].width, got[1].height, got[1].channels) == (5, 7, 3)
    assert got[1].mean_byte == 100.0
    assert (got[2].width, got[2].height, got[2].mean_byte) == (3, 2, 0.0)


def test_resize_media_real_kernel(spark):
    """Real PIL resize: output decodes to the requested size."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from hbase_gis_spark.operators.multimodal import resize_media

    df = spark.createDataFrame(
        [(1, _png_bytes(10, 10, 50))], "id bigint, media binary"
    )
    out = resize_media(df, 0, fake=False, size=(4, 6)).collect()[0]
    with Image.open(io.BytesIO(bytes(out.media))) as im:
        assert (im.width, im.height) == (4, 6)
    assert out.n_bytes == len(out.media)


def test_frame_sample_explodes_rows(media):
    n = 4
    out = frame_sample(media, n)
    counts = out.groupBy("id").count().collect()
    assert all(r["count"] <= n for r in counts)
    assert out.filter(F.col("frame_idx") >= n).count() == 0
    # frames reassemble a prefix of the source payload bytes
    one = out.filter(F.col("id") == 0).orderBy("frame_idx").collect()
    src = media.filter(F.col("id") == 0).select("media").first()[0]
    joined = b"".join(r.frame for r in one)
    assert bytes(src).startswith(joined[: len(src)])


def test_resize_media_deterministic(spark):
    from hbase_gis_spark.operators.multimodal import attach_fake_media, resize_media

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "ab"), (3, "x" * 100)], ["id", "text"]
    )
    out = {
        r.id: r.media
        for r in resize_media(attach_fake_media(docs), 16).collect()
    }
    assert all(len(b) == 16 for b in out.values())
    assert out[2] == (b"ab" * 8)          # cycle-padded
    assert out[3] == b"x" * 16            # truncated
    assert out[1] == (b"hello world" * 2)[:16]
