"""Multimodal plumbing + similarity-search operators."""

import numpy as np
import pytest


def test_media_features_deterministic(spark):
    from informationretrieval_en_people_cn_spark.operators import multimodal as mm

    media = mm.synth_media(spark, n=12)
    a = {r.media_id: (r.payload_sha256, tuple(r.feature)) for r in mm.extract_features(media).collect()}
    b = {r.media_id: (r.payload_sha256, tuple(r.feature)) for r in mm.extract_features(media).collect()}
    assert a == b
    assert len(a) == 12
    for sha, feat in a.values():
        assert len(sha) == 64
        assert len(feat) == mm.FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in feat)


def test_media_real_decoder_is_stubbed(spark):
    from informationretrieval_en_people_cn_spark.operators import multimodal as mm

    media = mm.synth_media(spark, n=3)
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        mm.extract_features(media, decoder_key="_real").collect()


def test_frame_sample_plan(spark):
    from informationretrieval_en_people_cn_spark.operators import multimodal as mm

    media = mm.synth_media(spark, n=9)
    frames = mm.frame_sample_plan(media, every_ms=1000).collect()
    assert frames  # one row per sampled frame ts, videos only
    vids = {r.media_id for r in frames}
    kinds = {r.media_id: r.kind for r in media.select("media_id", "kind").collect()}
    assert all(kinds[v] == "video" for v in vids)


def test_cosine_topk_matches_numpy(spark):
    from informationretrieval_en_people_cn_spark.operators.similarity import (
        cosine_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = emb.collect()
    q = [float(x) for x in rows[0].embedding]
    got = [(r.vec_id, r.cosine) for r in cosine_topk(emb.filter("vec_id <> 0"), q, 5).collect()]
    V = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = np.array([r.vec_id for r in rows])
    mask = ids != 0
    sims = (V[mask] @ np.asarray(q)) / (
        np.linalg.norm(V[mask], axis=1) * np.linalg.norm(q)
    )
    order = np.lexsort((ids[mask], -np.round(sims, 6)))[:5]
    want = [(int(ids[mask][i]), round(float(sims[i]), 6)) for i in order]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-6)
