"""Token-membership index: exact-bitmap and Bloom summaries, conservative
pruning, staleness safety. Contract under test is the zone map's "prune,
never lie": docs_with_token must equal decode-everything-and-filter on
every input — including with a STALE index over a mutated table (unknown
chunks degrade to candidacy), and the Bloom path may over-admit chunks
but never drop a document."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from copybook_rs_spark.config import EncodeConfig
from copybook_rs_spark.errors import PipelineContractError
from copybook_rs_spark.operators import (
    build_token_index,
    decode_tokens,
    delete_docs,
    docs_with_token,
    encode_tokens,
    filter_chunks_by_token,
)
from copybook_rs_spark.sources.tokens import token_table

SF_DIR = "/root/testdata/sf0.001"
CFG = EncodeConfig(
    chunk_values=4096, target_values_per_part=12_288, shuffle_partitions=8
)


@pytest.fixture(scope="module")
def tok_df(spark):
    df = token_table(spark, SF_DIR).cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def chunks(tok_df):
    df = encode_tokens(tok_df, CFG).cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def index(chunks):
    df = build_token_index(chunks).cache()
    yield df
    df.unpersist()


def _brute(chunks, token):
    dec = decode_tokens(chunks, cfg=CFG)
    return sorted(
        (r["doc_id"], r["n_hits"])
        for r in dec.select(
            "doc_id",
            F.size(
                F.filter(F.col("tokens"), lambda x: x == F.lit(int(token)))
            ).alias("n_hits"),
        )
        .where(F.col("n_hits") > 0)
        .collect()
    )


def _searched(chunks, index, token):
    return sorted(
        (r["doc_id"], r["n_hits"])
        for r in docs_with_token(chunks, index, token, cfg=CFG).collect()
    )


def test_exact_bitmap_search_matches_brute_force(spark, chunks, index):
    # the GPT-style vocabulary (< 2^17 range) must take the exact path
    kinds = {r["kind"] for r in index.select("kind").distinct().collect()}
    assert kinds == {0}
    # a common token, a rare token (exactly one doc), and absent tokens
    dec = decode_tokens(chunks, cfg=CFG)
    freq = (
        dec.select(F.explode("tokens").alias("t"))
        .groupBy("t").count().orderBy("count", "t")
    )
    rare = int(freq.first()["t"])
    common = int(freq.orderBy(F.desc("count"), "t").first()["t"])
    present = {
        int(r["t"]) for r in freq.select("t").limit(50257).collect()
    }
    absent_in_range = next(t for t in range(50257) if t not in present)
    for token in (common, rare, absent_in_range, -3, 10**9):
        assert _searched(chunks, index, token) == _brute(chunks, token), token


def test_exact_path_prunes_to_the_needle(spark, chunks, index):
    # for the rarest token, candidates must be a strict subset of the
    # table (exact bitmaps: candidates == chunks that really hold it)
    dec = decode_tokens(chunks, cfg=CFG)
    rare = int(
        dec.select(F.explode("tokens").alias("t"))
        .groupBy("t").count().orderBy("count", "t").first()["t"]
    )
    total = chunks.count()
    cand = filter_chunks_by_token(chunks, index, rare).count()
    assert 0 < cand < total
    # absent token -> zero candidates (exact, and the chunk-table zone map
    # handles out-of-envelope values even without index rows)
    assert filter_chunks_by_token(chunks, index, 10**9).count() == 0


def test_bloom_path_parity_no_false_negatives(spark):
    rng = np.random.default_rng(17)
    docs = []
    for i in range(400):
        n = int(rng.integers(5, 60))
        docs.append(
            (
                f"doc_{i:05d}",
                rng.integers(-(2**30), 2**30, n).astype(np.int32).tolist(),
                n,
                "W" if i % 3 else "V",
            )
        )
    pdf = pd.DataFrame(docs, columns=["doc_id", "tokens", "n_tok", "source"])
    df = spark.createDataFrame(
        pdf, schema="doc_id string, tokens array<int>, n_tok int, source string"
    )
    cfg = EncodeConfig(
        chunk_values=2048, target_values_per_part=8192, shuffle_partitions=8
    )
    chunks = encode_tokens(df, cfg).cache()
    index = build_token_index(chunks).cache()
    try:
        assert {r["kind"] for r in index.select("kind").distinct().collect()} == {1}
        # every planted token must be found with its exact count
        planted = [int(docs[7][1][0]), int(docs[100][1][-1])]
        absent = [int(x) for x in rng.integers(2**30, 2**31 - 1, 3)]
        dec = decode_tokens(chunks, cfg=cfg)
        for token in planted + absent:
            brute = sorted(
                (r["doc_id"], r["n_hits"])
                for r in dec.select(
                    "doc_id",
                    F.size(
                        F.filter(
                            F.col("tokens"), lambda x: x == F.lit(token)
                        )
                    ).alias("n_hits"),
                )
                .where(F.col("n_hits") > 0)
                .collect()
            )
            got = sorted(
                (r["doc_id"], r["n_hits"])
                for r in docs_with_token(chunks, index, token, cfg=cfg).collect()
            )
            assert got == brute, token
    finally:
        chunks.unpersist()
        index.unpersist()


def test_stale_index_degrades_to_candidacy_not_lies(spark, tok_df, chunks, index):
    # mutate the table AFTER the index was built: rewritten chunks' crcs
    # stop matching, so they are always-candidates under the OLD index —
    # results must still be exact against the NEW table
    victims = [r["doc_id"] for r in tok_df.select("doc_id").limit(40).collect()]
    mutated = delete_docs(chunks, victims, cfg=CFG).cache()
    try:
        dec = decode_tokens(mutated, cfg=CFG)
        token = int(
            dec.select(F.explode("tokens").alias("t"))
            .groupBy("t").count().orderBy(F.desc("count"), "t").first()["t"]
        )
        brute = sorted(
            (r["doc_id"], r["n_hits"])
            for r in dec.select(
                "doc_id",
                F.size(
                    F.filter(F.col("tokens"), lambda x: x == F.lit(token))
                ).alias("n_hits"),
            )
            .where(F.col("n_hits") > 0)
            .collect()
        )
        got = sorted(
            (r["doc_id"], r["n_hits"])
            for r in docs_with_token(mutated, index, token, cfg=CFG).collect()
        )
        assert got == brute
        assert all(d not in victims for d, _ in got)
    finally:
        mutated.unpersist()


def test_stale_blob_crc_column_fails_typed(spark, chunks):
    tampered = chunks.withColumn(
        "blob_crc", (F.col("blob_crc") + F.lit(1)) % F.lit(2**32)
    )
    # executor-side raise arrives Py4J-wrapped; the typed error's name and
    # message must survive into it
    with pytest.raises(Exception) as ei:
        build_token_index(tampered).count()
    assert PipelineContractError.__name__ in str(ei.value)
    assert "blob_crc" in str(ei.value)


def test_out_of_int64_token_is_provably_absent(spark, chunks, index):
    # F.lit / the numpy probe would overflow past int64; the operator must
    # answer "no documents" instead of an untyped error
    for needle in (2**63, -(2**63) - 1, 2**70):
        assert filter_chunks_by_token(chunks, index, needle).count() == 0
        assert docs_with_token(chunks, index, needle, cfg=CFG).count() == 0


def test_index_row_shape(index):
    r = index.first()
    assert set(index.columns) == {
        "chunk_id", "blob_crc", "kind", "ref", "n_distinct", "bits"
    }
    assert r["n_distinct"] > 0 and len(r["bits"]) > 0


def test_refresh_equals_full_rebuild_after_mutation(spark, tok_df, chunks, index):
    from copybook_rs_spark.operators import refresh_token_index

    victims = [r["doc_id"] for r in tok_df.select("doc_id").limit(30).collect()]
    mutated = delete_docs(chunks, victims, cfg=CFG).cache()
    try:
        refreshed = refresh_token_index(mutated, index)
        full = build_token_index(mutated)

        def canon(df):
            return sorted(
                (r["chunk_id"], r["blob_crc"], r["kind"], r["ref"],
                 r["n_distinct"], bytes(r["bits"]))
                for r in df.collect()
            )

        assert canon(refreshed) == canon(full)
        # the refresh only rebuilt the chunks the old index doesn't
        # describe (rewritten or new); everything else was kept verbatim
        meta = mutated.select("chunk_id", "blob_crc")
        n_pending = meta.subtract(
            index.select("chunk_id", "blob_crc")
        ).count()
        assert 0 < n_pending < mutated.count()
    finally:
        mutated.unpersist()


def test_all_tokens_conjunction_matches_brute_force(spark, chunks, index):
    from copybook_rs_spark.operators import docs_with_all_tokens

    dec = decode_tokens(chunks, cfg=CFG)
    # a real co-occurring pair: two tokens from one actual document
    some = dec.select("doc_id", "tokens").where(F.size("tokens") >= 2).first()
    t1, t2 = int(some["tokens"][0]), int(some["tokens"][-1])

    def brute(ts):
        def has(t):
            return F.exists(F.col("tokens"), lambda x: x == F.lit(t))

        pred = F.lit(True)
        for t in ts:
            pred = pred & has(t)
        return sorted(
            (r["doc_id"], r["source"])
            for r in dec.where(pred).select("doc_id", "source").collect()
        )

    for ts in ([t1], [t1, t2], [t1, t2, 10**9]):
        got = sorted(
            (r["doc_id"], r["source"])
            for r in docs_with_all_tokens(chunks, index, ts, cfg=CFG).collect()
        )
        assert got == brute(ts), ts
        # positive control: the sampled doc itself must appear whenever
        # every needle came from it (guards a value-blind brute twin)
        if 10**9 not in ts:
            assert some["doc_id"] in {d for d, _ in got}, ts
        else:
            assert got == []
    # conjunction candidates never exceed a single needle's candidates
    from copybook_rs_spark.operators.token_index import _candidate_ids
    c1 = _candidate_ids(chunks, index, [t1]).count()
    c12 = _candidate_ids(chunks, index, [t1, t2]).count()
    assert 0 < c12 <= c1
    # impossible needle -> provably empty without decoding
    assert docs_with_all_tokens(chunks, index, [t1, 2**64], cfg=CFG).count() == 0
    with pytest.raises(PipelineContractError):
        docs_with_all_tokens(chunks, index, [], cfg=CFG)


def test_any_token_disjunction_matches_brute_force(spark, chunks, index):
    from copybook_rs_spark.operators import docs_with_any_token

    dec = decode_tokens(chunks, cfg=CFG)
    some = dec.select("doc_id", "tokens").where(F.size("tokens") >= 2).first()
    other = (
        dec.select("doc_id", "tokens")
        .where(F.col("doc_id") != some["doc_id"])
        .first()
    )
    t1, t2 = int(some["tokens"][0]), int(other["tokens"][-1])

    def brute(ts):
        def has(t):
            return F.exists(F.col("tokens"), lambda x: x == F.lit(t))

        pred = F.lit(False)
        for t in ts:
            pred = pred | has(t)
        return sorted(
            (r["doc_id"], r["source"])
            for r in dec.where(pred).select("doc_id", "source").collect()
        )

    for ts in ([t1], [t1, t2], [t1, t2, 10**9]):
        got = sorted(
            (r["doc_id"], r["source"])
            for r in docs_with_any_token(chunks, index, ts, cfg=CFG).collect()
        )
        assert got == brute(ts), ts
        # positive controls: both sampled docs appear once their token is
        # in the disjunction
        names = {d for d, _ in got}
        assert some["doc_id"] in names
        if t2 in ts:
            assert other["doc_id"] in names
    # out-of-int64 needles drop out of the disjunction (not an error)
    got2 = sorted(
        (r["doc_id"], r["source"])
        for r in docs_with_any_token(chunks, index, [t1, 2**64], cfg=CFG).collect()
    )
    assert got2 == brute([t1])
    assert docs_with_any_token(chunks, index, [2**64], cfg=CFG).count() == 0
    with pytest.raises(PipelineContractError):
        docs_with_any_token(chunks, index, [], cfg=CFG)


def test_probe_batch_matches_scalar_reference():
    # round-6 vectorization: _probe_batch must answer bit-for-bit like the
    # per-row _maybe_contains fold it replaced, across bitmap rows, Bloom
    # rows of several m_bits sizes, empty-bits rows and out-of-range
    # needles, for both the conjunctive and disjunctive folds
    from copybook_rs_spark.operators.token_index import (
        _maybe_contains,
        _presence_bits,
        _probe_batch,
    )

    rng = np.random.default_rng(99)
    rows = []
    for i in range(200):
        shape = i % 4
        if shape == 0:  # narrow range -> exact bitmap
            vals = rng.integers(0, 5000, rng.integers(1, 400))
        elif shape == 1:  # wide range -> bloom, size varies with distinct
            vals = rng.integers(0, 2**40, rng.integers(1, 3000))
        elif shape == 2:  # wide + small distinct -> small bloom
            vals = rng.choice(
                rng.integers(0, 2**40, 8), rng.integers(1, 50)
            )
        else:  # empty
            vals = np.empty(0, dtype=np.int64)
        rows.append(_presence_bits(vals.astype(np.int64)))
    kinds = np.array([r[0] for r in rows], dtype=np.int64)
    refs = np.array([r[1] for r in rows], dtype=np.int64)
    bits = [r[3] for r in rows]
    # adversarial rows for the int64-wrap guard: a bitmap whose ref (vmin)
    # sits near +2^63 probed with needles near -2^63 — t - ref wraps
    # positive in int64; the t >= ref mask must keep the answer False
    # exactly like the scalar reference's arbitrary-precision pos < 0
    kinds = np.append(kinds, [0, 0])
    refs = np.append(refs, [2**63 - 10, 2**62])
    bits.extend([b"\xff" * 16, b"\xff" * 16])
    # NULL bits row (nullable after a parquet round-trip): scalar guard
    # answers False; the batch path must not TypeError
    kinds = np.append(kinds, [1])
    refs = np.append(refs, [0])
    bits.append(None)
    needles_sets = [
        [0], [1212], [-5], [2**39], [4999, 5000, 2**40 - 1], [7, 2**35, 12],
        [-(2**63), -(2**63) + 5, 2**63 - 1],
    ]
    for needles in needles_sets:
        for conj in (True, False):
            fold = all if conj else any
            want = np.array(
                [
                    fold(
                        _maybe_contains(int(k), int(r), b, t)
                        for t in needles
                    )
                    for k, r, b in zip(kinds, refs, bits)
                ]
            )
            got = _probe_batch(kinds, refs, bits, needles, conj)
            assert np.array_equal(got, want), (needles, conj)
