"""Multimodal resize and video frame-sampling plumbing: payload/meta
rewrite, uniform stride policy, short-clip behavior, determinism."""

from __future__ import annotations

def test_resize_rewrites_payload_and_meta(spark, sf_smoke):
    from leader_graph_spark.operators.multimodal import attach_fake_payloads, resize_images
    from leader_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(8)
    mm = attach_fake_payloads(docs, text_col="text", id_col="doc_id")
    out = resize_images(mm, id_col="doc_id", target_w=64, target_h=48).collect()
    orig = {r.doc_id: r.meta for r in mm.collect()}
    assert len(out) == 8
    for r in out:
        assert (r.meta.width, r.meta.height) == (64, 48)
        assert (r.meta.orig_width, r.meta.orig_height) == (
            orig[r.doc_id].width, orig[r.doc_id].height,
        )
        assert r.meta.format == orig[r.doc_id].format
        assert len(r.payload) == 64 * 48 * 3  # plausible resized size
    # deterministic: same input → same resized bytes
    again = resize_images(mm, id_col="doc_id", target_w=64, target_h=48).collect()
    assert {(r.doc_id, bytes(r.payload)) for r in out} == {
        (r.doc_id, bytes(r.payload)) for r in again
    }


def test_frame_sampling_uniform_and_short_clips(spark):
    from leader_graph_spark.operators.multimodal import sample_video_frames

    # clip 1: 10 frames of 4 bytes; clip 2: shorter than n_frames
    rows = [(1, bytes(range(40))), (2, b"abcd" * 2)]
    df = spark.createDataFrame(rows, "vid long, payload binary")
    out = sample_video_frames(
        df, id_col="vid", n_frames=4, fps=25, frame_bytes=4
    ).collect()
    by_vid = {}
    for r in out:
        by_vid.setdefault(r.vid, []).append((r.frame_idx, r.ts_ms))
    # uniform stride over 10 frames → indices 0,2,5,7
    assert [i for i, _ in sorted(by_vid[1])] == [0, 2, 5, 7]
    # timestamps follow the frame rate (40ms per frame at 25fps)
    assert dict(by_vid[1])[5] == 200
    # short clip: every frame it has, exactly once
    assert [i for i, _ in sorted(by_vid[2])] == [0, 1]
    # fingerprints differ across distinct frames
    hashes = {r.frame_phash for r in out if r.vid == 1}
    assert len(hashes) == 4
