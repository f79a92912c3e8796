"""Semantic tests for the LLM-pipeline operators: ANN recall, MinHash
LSH recall against true Jaccard, SimHash similarity behavior, and the
multimodal decode plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql_cdc_table_spark.functions.dedup import (
    dedup_minhash_pairs,
    dedup_ngram_jaccard,
)
from mysql_cdc_table_spark.functions.multimodal import (
    mm_decode_features,
)
from mysql_cdc_table_spark.functions.similarity import (
    ann_cosine_topk,
    ann_ivf_topk,
)


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    """IVF with n_probe=3 of 10 cells must recover a decent fraction of
    the true top-20 (embeddings are near-random, so cells carry little
    signal — the contract here is mechanism + non-trivial recall)."""
    exact = {r["vec_id"] for r in ann_cosine_topk(spark, sf_dir).collect()}
    approx = {r["vec_id"] for r in ann_ivf_topk(spark, sf_dir).collect()}
    assert len(approx) == 20
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"IVF recall collapsed: {recall}"
    # every IVF hit must come from a probed cell and carry a valid cosine
    for r in ann_ivf_topk(spark, sf_dir).collect():
        assert -1.0 <= r["cos"] <= 1.0


def test_minhash_lsh_recalls_high_jaccard_pairs(spark, sf_dir):
    """Pairs with very high true Jaccard must be surfaced by LSH banding
    (4 bands x 4 rows: P[caught] = 1-(1-j^4)^4 -> ~0.99 at j=0.9)."""
    true_pairs = {
        (r["doc1"], r["doc2"])
        for r in dedup_ngram_jaccard(spark, sf_dir).collect()
        if r["jaccard"] >= 0.9
    }
    lsh_pairs = {
        (r["doc1"], r["doc2"]) for r in dedup_minhash_pairs(spark, sf_dir).collect()
    }
    assert true_pairs, "fixture should contain planted near-duplicates"
    recall = len(true_pairs & lsh_pairs) / len(true_pairs)
    assert recall >= 0.8, f"LSH missed high-jaccard pairs: {recall}"


def test_decode_real_image_formats(spark, sf_dir):
    """The decode stage is a REAL parser: exact pixel recovery from both
    supported containers, format sniffing, error paths, and the Spark
    pipeline's schema/determinism/row preservation."""
    import numpy as np
    import pytest

    from mysql_cdc_table_spark.functions.multimodal import (
        decode_image_bytes,
        encode_bmp,
        encode_ppm,
    )

    # exact roundtrip of a non-constant image through both containers
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    for enc, codec in ((encode_ppm, "ppm"), (encode_bmp, "bmp")):
        c, w, h, nch, mean = decode_image_bytes(enc(3, 5, img))
        assert (c, w, h, nch) == (codec, 3, 5, 3)
        assert mean == float(img.mean())  # BMP padding/BGR/bottom-up undone
    # PPM comments in the header parse
    ppm = encode_ppm(3, 5, img)
    commented = b"P6\n# a comment\n3 5\n255\n" + ppm[ppm.index(b"255\n") + 4 :]
    assert decode_image_bytes(commented)[:3] == ("ppm", 3, 5)
    # unknown magic without PIL -> pointed error, never a fake
    with pytest.raises(ValueError, match="PPM/BMP"):
        decode_image_bytes(b"\x89PNG\r\n\x1a\nnot really")
    # truncated/malformed PPM headers raise instead of hanging the task
    # (round-4 ADVICE: the header scan used to run off the buffer end)
    for bad in (b"P6", b"P6\n", b"P6\n3 5", b"P6\n# only a comment",
                b"P6\n3 5\n255"):
        with pytest.raises(ValueError, match="truncated PPM header"):
            decode_image_bytes(bad)

    out = mm_decode_features(spark, sf_dir)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "codec", "width", "height", "n_channels", "mean_intensity",
    ]
    rows = out.collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs
    again = {r["doc_id"]: r for r in mm_decode_features(spark, sf_dir).collect()}
    for r in rows[:50]:
        assert again[r["doc_id"]] == r  # deterministic
        did = r["doc_id"]
        assert r["codec"] == ("ppm" if did % 2 == 0 else "bmp")
        assert (r["width"], r["height"]) == (did % 64 + 1, did % 48 + 1)
        assert r["mean_intensity"] == float(did % 256)


def test_exact_topk_is_sorted_and_complete(spark, sf_dir):
    rows = ann_cosine_topk(spark, sf_dir).collect()
    assert len(rows) == 20
    cos = [r["cos"] for r in rows]
    assert cos == sorted(cos, reverse=True)
    assert 0 not in {r["vec_id"] for r in rows}  # self excluded


def test_trained_ivf_recall(spark, sf_dir):
    """k-means IVF: deterministic across runs, valid cosines, non-trivial
    recall vs the exact top-20."""
    from mysql_cdc_table_spark.functions.similarity import ann_ivf_trained_topk

    r1 = [(r["vec_id"], r["cos"]) for r in ann_ivf_trained_topk(spark, sf_dir).collect()]
    r2 = [(r["vec_id"], r["cos"]) for r in ann_ivf_trained_topk(spark, sf_dir).collect()]
    assert r1 == r2  # deterministic (no RNG in init or argmin ties)
    assert len(r1) == 20
    exact = {r["vec_id"] for r in ann_cosine_topk(spark, sf_dir).collect()}
    recall = len(exact & {v for v, _ in r1}) / len(exact)
    assert recall >= 0.2, f"trained-IVF recall collapsed: {recall}"


def test_block_pairs_hot_label_bounded(spark, tmp_path):
    """A label hotter than HOT_BLOCK_CAP is sub-blocked by vec_id % nsub:
    pair count is sum-of-sub-block-squares, never the full block square.
    Identical unit vectors make every cosine 1.0, so counts are exact."""
    from mysql_cdc_table_spark.functions.similarity import (
        HOT_BLOCK_CAP,
        ann_block_pairs,
    )

    rows = [(i, [1.0, 0.0, 0.0, 0.0], 0) for i in range(450)]
    rows += [(1000 + i, [0.0, 1.0, 0.0, 0.0], 1) for i in range(10)]
    df = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    )
    sf = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf}/embeddings.parquet")

    pairs = ann_block_pairs(spark, sf).groupBy("label").count().collect()
    by_label = {r["label"]: r["count"] for r in pairs}

    # hot label: nsub = ceil(450/200) = 3 sub-blocks of 150 each
    assert HOT_BLOCK_CAP == 200
    assert by_label[0] == 3 * (150 * 149 // 2)  # 33525, not C(450,2)=101025
    # cold label below the cap is untouched: all C(10,2) pairs
    assert by_label[1] == 10 * 9 // 2


def test_chunking_overlap_and_coverage(spark, sf_dir):
    """Chunk windows must tile every document: consecutive chunks overlap
    by CHUNK_TOKENS - CHUNK_STRIDE tokens, the first chunk starts at 1,
    and every token index is covered by some chunk."""
    from mysql_cdc_table_spark.functions.pipeline import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        text_chunk_sliding,
    )

    rows = text_chunk_sliding(spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        n = max(c["end"] for c in chunks)
        assert chunks[0]["start"] == 1
        for a, b in zip(chunks, chunks[1:]):
            assert b["start"] - a["start"] == CHUNK_STRIDE
            # overlap: next chunk starts before this one ends (long docs)
            if a["end"] - a["start"] + 1 == CHUNK_TOKENS:
                assert b["start"] <= a["end"] + 1
        # full coverage: no token index falls between chunks
        covered = set()
        for c in chunks:
            covered.update(range(c["start"], c["end"] + 1))
        assert covered == set(range(1, n + 1)), doc_id
        # chunk text matches its span width
        for c in chunks:
            assert len(c["chunk_text"].split(" ")) == c["end"] - c["start"] + 1


def test_cluster_resolve_is_a_valid_cc_labelling(spark, sf_dir):
    """dedup_cluster_resolve must assign every LSH pair's endpoints the
    same cluster, label each cluster by its min member, and mark exactly
    one keeper per cluster."""
    from mysql_cdc_table_spark.functions.dedup import dedup_cluster_resolve

    cc = {r["doc_id"]: r for r in dedup_cluster_resolve(spark, sf_dir).collect()}
    pairs = dedup_minhash_pairs(spark, sf_dir).collect()
    assert pairs, "fixture should contain planted near-duplicates"
    for p in pairs:
        assert cc[p["doc1"]]["cluster_id"] == cc[p["doc2"]]["cluster_id"]
    clusters: dict[int, list[int]] = {}
    for doc_id, r in cc.items():
        clusters.setdefault(r["cluster_id"], []).append(doc_id)
    for cid, members in clusters.items():
        assert cid == min(members)  # min-id labelling
        keepers = [d for d in members if cc[d]["is_keeper"] == 1]
        assert keepers == [cid]  # exactly one keeper, the min
        for d in members:
            assert cc[d]["cluster_size"] == len(members)


def test_cluster_resolve_raises_when_cap_hit(spark, sf_dir, monkeypatch):
    """If the iteration cap exits before the labelling is stationary,
    the operator must raise — silently returning a non-converged
    labelling diverges from the exact recursive-CTE oracle."""
    from mysql_cdc_table_spark.functions import dedup as _dedup

    monkeypatch.setattr(_dedup, "CC_MAX_ITERS", 0)
    with pytest.raises(RuntimeError, match="did not converge"):
        _dedup.dedup_cluster_resolve(spark, sf_dir).collect()


def test_knn_join_shape_and_block_discipline(spark, sf_dir):
    """Every query gets at most k ranked neighbours, ordered by cosine,
    all drawn from the query's own label block, never itself."""
    from mysql_cdc_table_spark.functions.similarity import KNN_K, ann_knn_join

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    label_of = {r["vec_id"]: r["label"] for r in e.collect()}
    by_q: dict[int, list] = {}
    for r in ann_knn_join(spark, sf_dir).collect():
        by_q.setdefault(r["qid"], []).append(r)
    assert by_q
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rk"])
        assert len(rows) <= KNN_K
        assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
        cos = [r["cos"] for r in rows]
        assert cos == sorted(cos, reverse=True)
        for r in rows:
            assert r["vec_id"] != qid
            assert label_of[r["vec_id"]] == label_of[qid]


def test_contamination_benchmark_docs_fully_contaminated(spark, sf_dir):
    """Benchmark members overlap themselves 100%; all fractions in [0,1];
    every shingled doc is scored."""
    from mysql_cdc_table_spark.functions.text import BENCH_STRIDE, text_contamination

    rows = text_contamination(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["contam_frac"] <= 1.0
        assert 0 <= r["n_hit"] <= r["n_sh"]
        if r["doc_id"] % BENCH_STRIDE == 0:
            assert r["contam_frac"] == 1.0


def test_token_bpe_matches_python_re(spark, sf_dir):
    """The regex pre-tokenizer must agree with Python's re on real rows."""
    import re

    from mysql_cdc_table_spark.functions.text import BPE_PAT, text_token_bpe

    got = {r["doc_id"]: r for r in text_token_bpe(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50).collect()
    pat = re.compile(BPE_PAT)
    for d in docs:
        toks = pat.findall(d["text"])
        r = got[d["doc_id"]]
        assert r["n_bpe"] == len(toks)
        assert r["n_word"] == sum(1 for t_ in toks if t_[0].isalpha())
        assert r["n_punct"] >= 0


def test_retention_cohorts_invariants(spark, sf_dir):
    """Offset-0 retention is exactly 1.0; counts never exceed the cohort;
    cohort sizes partition the user base."""
    from mysql_cdc_table_spark.operators.analytics import retention_cohorts

    rows = retention_cohorts(spark, sf_dir).collect()
    assert rows
    day0 = [r for r in rows if r["day_offset"] == 0]
    assert day0
    for r in day0:
        assert r["n_active"] == r["cohort_size"] and r["retention"] == 1.0
    for r in rows:
        assert 0 <= r["day_offset"] <= 14
        assert 0 < r["n_active"] <= r["cohort_size"]
    sizes = {r["cohort_day"]: r["cohort_size"] for r in rows}
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id").distinct().count()
    )
    assert sum(sizes.values()) == n_users


def test_sessionize_matches_python_replay(spark, sf_dir):
    """Session boundaries and summaries must match a per-user Python
    replay of the 30-minute-gap rule."""
    from mysql_cdc_table_spark.operators.analytics import (
        SESSION_GAP_US,
        sessionize_events,
    )

    got = {}
    for r in sessionize_events(spark, sf_dir).collect():
        got[(r["user_id"], r["session_seq"])] = r
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "user_id",
            "event_id",
            # same integer-microsecond basis as the operator (ts may be
            # TIMESTAMP_NTZ; session TZ is UTC so the cast is exact)
            "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
        )
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append((r["us"], r["event_id"]))
    n_sessions = 0
    for uid, rows in by_user.items():
        rows.sort()
        seq, start, n, last = 0, None, 0, None
        for us, _eid in rows:
            if last is None or us - last > SESSION_GAP_US:
                if seq:
                    r = got[(uid, seq)]
                    assert (r["n_events"], r["start_us"], r["end_us"]) == (
                        n, start, last,
                    )
                seq += 1
                start, n = us, 0
                n_sessions += 1
            n += 1
            last = us
        r = got[(uid, seq)]
        assert (r["n_events"], r["start_us"], r["end_us"]) == (n, start, last)
    assert len(got) == n_sessions


def test_pack_sequences_partitions_corpus_exactly(spark, sf_dir):
    """Packing invariants: every sequence except the last is filled to
    exactly SEQ_LEN tokens; each document's slices tile [0, n_tok)
    without gaps or overlap; total packed tokens equal total corpus
    tokens."""
    from mysql_cdc_table_spark.functions.quality import (
        SEQ_LEN,
        corpus_pack_sequences,
    )
    from mysql_cdc_table_spark.functions.text import tokens as _tokens

    rows = corpus_pack_sequences(spark, sf_dir).collect()
    assert rows
    fill_by_seq: dict[int, int] = {}
    by_doc: dict[int, list] = {}
    for r in rows:
        assert 0 <= r["doc_from"] < r["doc_to"]
        assert r["n_fill"] == r["doc_to"] - r["doc_from"]
        fill_by_seq[r["seq_id"]] = fill_by_seq.get(r["seq_id"], 0) + r["n_fill"]
        by_doc.setdefault(r["doc_id"], []).append((r["doc_from"], r["doc_to"]))
    last_seq = max(fill_by_seq)
    for sid, fill in fill_by_seq.items():
        assert fill == SEQ_LEN or sid == last_seq, (sid, fill)
    assert set(fill_by_seq) == set(range(last_seq + 1))  # no empty seqs
    n_tok = {
        r["doc_id"]: r["n"]
        for r in t_docs(spark, sf_dir).collect()
    }
    for doc_id, spans in by_doc.items():
        spans.sort()
        assert spans[0][0] == 0
        assert spans[-1][1] == n_tok[doc_id]
        for (a, b), (c, d) in zip(spans, spans[1:]):
            assert b == c  # contiguous, non-overlapping
    assert sum(fill_by_seq.values()) == sum(
        n for d, n in n_tok.items() if d in by_doc
    )


def t_docs(spark, sf_dir):
    from mysql_cdc_table_spark.functions.text import tokens

    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.size(tokens(F.col("text"))).alias("n"))
        .filter(F.col("n") > 0)
    )


def test_corpus_prep_pipeline_consistent_with_stages(spark, sf_dir):
    """The composed pipeline's doc counts must equal running its stages
    independently."""
    from mysql_cdc_table_spark.functions.dedup import dedup_exact
    from mysql_cdc_table_spark.functions.pipeline import corpus_prep_pipeline
    from mysql_cdc_table_spark.functions.text import text_quality_filter

    out = corpus_prep_pipeline(spark, sf_dir).collect()
    assert out
    quality_ids = {
        r["doc_id"] for r in text_quality_filter(spark, sf_dir).collect()
    }
    keeper_ids = {r["keep_doc_id"] for r in dedup_exact(spark, sf_dir).collect()}
    assert sum(r["n_docs"] for r in out) == len(quality_ids & keeper_ids)
    for r in out:
        assert r["total_chunks"] >= r["n_docs"]  # >=1 chunk per kept doc
        assert 350_000 <= r["avg_quality_e6"] <= 1_000_000


def test_ivf_pq_recall_and_mechanism(spark, sf_dir):
    """PQ codes are well-formed (PQ_M codes per vector, cids in range),
    the search is deterministic, and ADC+rerank recovers a non-trivial
    fraction of the true top-20."""
    from mysql_cdc_table_spark.functions.similarity import (
        PQ_K,
        PQ_M,
        ann_ivf_pq_topk,
        pq_codebooks_and_codes,
    )

    cents, codes = pq_codebooks_and_codes(spark, sf_dir)
    per_vec: dict[int, set] = {}
    for r in codes.collect():
        assert 0 <= r["cid"] < PQ_K
        per_vec.setdefault(r["vec_id"], set()).add(r["m"])
    assert all(ms == set(range(PQ_M)) for ms in per_vec.values())
    n_cents = cents.count()
    assert n_cents <= PQ_M * PQ_K

    got = ann_ivf_pq_topk(spark, sf_dir).collect()
    assert len(got) == 20
    assert [r["vec_id"] for r in got] == [
        r["vec_id"] for r in ann_ivf_pq_topk(spark, sf_dir).collect()
    ]  # deterministic
    exact = {r["vec_id"] for r in ann_cosine_topk(spark, sf_dir).collect()}
    recall = len(exact & {r["vec_id"] for r in got}) / len(exact)
    assert recall >= 0.2, f"PQ recall collapsed: {recall}"


def test_pii_scrub_redacts_everything(spark, sf_dir):
    """After scrubbing, no email/phone/IP survives; counts follow the
    deterministic doc_id-based fixture presence rules."""
    import re

    from mysql_cdc_table_spark.functions.quality import text_pii_scrub

    rows = text_pii_scrub(spark, sf_dir).collect()
    assert rows
    email = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    ip = re.compile(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b")
    for r in rows:
        assert not email.search(r["clean_text"]), r["doc_id"]
        assert not ip.search(r["clean_text"]), r["doc_id"]
        assert "+1-555-" not in r["clean_text"]
        assert r["n_emails"] == (1 if r["doc_id"] % 3 > 0 else 0)
        assert r["n_phones"] == (1 if r["doc_id"] % 2 == 0 else 0)
        assert r["n_ips"] == (1 if r["doc_id"] % 5 > 1 else 0)
        if r["n_emails"]:
            assert "<EMAIL>" in r["clean_text"]


def test_repetition_score_invariants(spark, sf_dir):
    """Counts are internally consistent: top <= total, n_bigrams =
    n_tokens - 1, distinct <= tokens, keep matches the 20% rule."""
    from mysql_cdc_table_spark.functions.quality import text_repetition_score

    rows = text_repetition_score(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_distinct"] <= r["n_tokens"]
        assert 1 <= r["top_unigram_count"] <= r["n_tokens"]
        assert r["n_bigrams"] == max(r["n_tokens"] - 1, 0)
        assert r["top_bigram_count"] <= max(r["n_bigrams"], 1)
        want = (
            r["top_unigram_count"] * 5 <= r["n_tokens"]
            and r["top_bigram_count"] * 5 <= max(r["n_bigrams"], 1)
        )
        assert r["keep"] == want


def test_corpus_mix_equalize_strata_equal(spark, sf_dir):
    """Every surviving stratum has exactly min-stratum-size rows, and
    the selection is a subset of the input."""
    from collections import Counter

    from mysql_cdc_table_spark.functions.quality import corpus_mix_equalize
    from mysql_cdc_table_spark.operators._util import t

    kept = corpus_mix_equalize(spark, sf_dir).collect()
    totals = Counter(
        r["source"] for r in t(spark, sf_dir, "documents").select("source").collect()
    )
    m = min(totals.values())
    per_src = Counter(r["source"] for r in kept)
    assert set(per_src) == set(totals)
    assert all(v == m for v in per_src.values()), per_src


def test_lsh_rp_mechanism_and_recall(spark, sf_dir):
    """Signatures are in range, the probe set is hamming<=1 of the query
    signature, results are deterministic, and candidates overlap the
    exact top-20 (recall floor is loose: 6-bit LSH on random vectors)."""
    from pyspark.sql import functions as F

    from mysql_cdc_table_spark.functions.similarity import (
        LSH_NB,
        _lsh_bucket,
        ann_lsh_rp_topk,
    )
    from mysql_cdc_table_spark.operators._util import t

    e = t(spark, sf_dir, "embeddings")
    b = e.select("vec_id", _lsh_bucket(F.col("embedding")).alias("bkt"))
    buckets = {r["vec_id"]: r["bkt"] for r in b.collect()}
    assert all(0 <= v < (1 << LSH_NB) for v in buckets.values())
    assert len(set(buckets.values())) > 1  # planes actually split the space

    got = ann_lsh_rp_topk(spark, sf_dir).collect()
    assert got
    qb = buckets[0]
    for r in got:
        assert bin(buckets[r["vec_id"]] ^ qb).count("1") <= 1
    assert [r["vec_id"] for r in got] == [
        r["vec_id"] for r in ann_lsh_rp_topk(spark, sf_dir).collect()
    ]
    exact = {r["vec_id"] for r in ann_cosine_topk(spark, sf_dir).collect()}
    hits = exact & {r["vec_id"] for r in got}
    assert hits, "LSH top-k shares nothing with exact top-20"


def test_mix_temperature_shares(spark, sf_dir):
    """Share targets follow integer sqrt weights; kept counts equal the
    target (capped by stratum size); smaller strata get a LARGER share
    relative to their size than big ones (the point of temperature)."""
    import math

    from collections import Counter

    from mysql_cdc_table_spark.functions.quality import (
        MIX_KEEP_TOTAL,
        corpus_mix_temperature,
    )
    from mysql_cdc_table_spark.operators._util import t

    totals = Counter(
        r["source"] for r in t(spark, sf_dir, "documents").select("source").collect()
    )
    w = {s: math.isqrt(n) for s, n in totals.items()}
    tw = sum(w.values())
    rows = {r["source"]: r for r in corpus_mix_temperature(spark, sf_dir).collect()}
    assert set(rows) <= set(totals)
    for s, r in rows.items():
        assert r["n_total"] == totals[s]
        assert r["share_target"] == w[s] * MIX_KEEP_TOTAL // tw
        assert r["n_kept"] == min(r["share_target"], totals[s])


def test_pii_regex_subset_parity_adversarial(spark):
    """The PII patterns claim a Java-regex ∩ RE2 common subset. Verify
    on adversarial strings (not just the digit-free corpus): multiple
    hits, boundary positions, unicode neighbors, near-misses like
    999.999.999.999 (still matches \\d{1,3} thrice), IPs embedded in
    version strings, emails with +tags and trailing dots."""
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from mysql_cdc_table_spark.functions.quality import EMAIL_RE, IP_RE, PHONE_RE

    cases = [
        "a@b.co x@y.io two emails",
        "ip 10.0.0.1 and 999.999.999.999 and 1.2.3.4.5",
        "call +1-555-0100 or +49-123-4567 done",
        "email+tag@sub.domain.example.com.",
        "@nope.com user@ .com a@b",
        "v1.2.3.4 release",
        "ünïcödé user1@mail.example.com tail",
        "edge@case.io",
        "10.1.2.3",
        "+1-555-0000",
        "nested user@[10.0.0.1] bracket",
        "dots..everywhere..a@b.cc..",
        "phone+1-555-123x suffix +12-345-6789 y",
        "",
        "no pii at all",
    ]
    pdf = pd.DataFrame({"i": range(len(cases)), "s": cases})

    def spark_scrub():
        df = spark.createDataFrame(pdf)
        clean = F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("s"), EMAIL_RE, "<EMAIL>"),
                PHONE_RE,
                "<PHONE>",
            ),
            IP_RE,
            "<IP>",
        )
        return {r["i"]: r["c"] for r in df.select("i", clean.alias("c")).collect()}

    con = duckdb.connect()
    con.register("t", pdf)
    duck = {
        i: c
        for i, c in con.execute(
            f"""SELECT i, regexp_replace(regexp_replace(regexp_replace(
                    s, '{EMAIL_RE}', '<EMAIL>', 'g'),
                       '{PHONE_RE}', '<PHONE>', 'g'),
                       '{IP_RE}', '<IP>', 'g') FROM t"""
        ).fetchall()
    }
    got = spark_scrub()
    assert got == duck, {
        i: (got[i], duck[i]) for i in got if got[i] != duck[i]
    }


def test_cms_hash_parity_and_exactness(spark, sf_dir):
    """Count-Min mechanism: (a) the JVM char fold used by the probe
    stage equals the Python fold the builder uses, word for word;
    (b) on this corpus (vocabulary ≪ w, few collisions) the sketch's
    min-over-rows estimate equals the exact count for every probe, so
    both oracle booleans are TRUE for all 20 rows — a broken merge,
    hash, or min would show as est > exact + slack or est < exact."""
    from pyspark.sql import functions as F

    from mysql_cdc_table_spark.operators.round7 import (
        CMS_MOD,
        _cms_word_code,
        agg_count_min_sketch,
    )

    words = ["the", "spark", "a", "zz9!", "merge", "", "Ünïcode"]
    sql_codes = (
        spark.createDataFrame([(w,) for w in words], "word string")
        .select(
            F.expr(
                f"aggregate(split(word, ''), cast(0 as bigint),"
                f" (acc, c) -> (acc * 131 + ascii(c)) % {CMS_MOD})"
            ).alias("code")
        )
        .collect()
    )
    for w, row in zip(words, sql_codes):
        py = _cms_word_code(w)
        # ascii() in Spark returns the first codepoint like ord() for
        # BMP chars; parity must hold for every probe word
        assert row["code"] == py, (w, row["code"], py)

    out = agg_count_min_sketch(spark, sf_dir).collect()
    assert len(out) == 20
    assert all(r["overestimates_ok"] and r["within_bound"] for r in out)


def test_bloom_mechanism_no_false_negatives(spark, sf_dir):
    """Bloom invariants on the real corpus: every present probe is a
    member (no false negatives — structural, not probabilistic), the
    fp bound holds, and the double-hash SQL folds match the Python
    builder's codes."""
    from pyspark.sql import functions as F

    from mysql_cdc_table_spark.operators.round7 import (
        CMS_MOD,
        _bloom_codes,
        agg_bloom_membership,
    )

    out = agg_bloom_membership(spark, sf_dir).collect()
    assert len(out) == 10
    assert all(r["present_found"] and r["fp_bound_ok"] for r in out)

    words = ["the", "spark", "Ünïcode", "x"]
    rows = (
        spark.createDataFrame([(w,) for w in words], "word string")
        .select(
            F.expr(
                f"aggregate(split(word, ''), cast(0 as bigint),"
                f" (acc, c) -> (acc * 131 + ascii(c)) % {CMS_MOD})"
            ).alias("a"),
            F.expr(
                f"aggregate(split(word, ''), cast(0 as bigint),"
                f" (acc, c) -> (acc * 137 + ascii(c)) % {CMS_MOD})"
            ).alias("b"),
        )
        .collect()
    )
    for w, r in zip(words, rows):
        assert (r["a"], r["b"]) == _bloom_codes(w), w


def test_ahash_sensitive_to_spatial_and_channel_errors():
    """The aHash key has teeth: a decoder that flipped rows (BMP
    bottom-up mishandled) or swapped channels (BGR kept) would change
    the hash for gradient images — verify directly on the pixel
    math."""
    import numpy as np

    from mysql_cdc_table_spark.functions.multimodal import (
        decode_image_pixels,
        encode_bmp,
    )

    did = 7
    w, h = did % 16 + 8, did % 12 + 8
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    rgb = np.stack(
        [(x + y + did) % 256, (2 * x + y + did) % 256,
         (x + 3 * y + did) % 256],
        axis=-1,
    ).astype(np.uint8)
    _codec, px = decode_image_pixels(encode_bmp(w, h, rgb))
    assert (px == rgb).all()  # spatially exact decode

    def ahash(p):
        s = (3 * p[:, :, 0].astype(np.int64)
             + 2 * p[:, :, 1].astype(np.int64)
             + p[:, :, 2].astype(np.int64))
        bx = (np.arange(w) * 8) // w
        by = (np.arange(h) * 8) // h
        bs = np.zeros((8, 8), np.int64)
        bp = np.zeros((8, 8), np.int64)
        np.add.at(bs, (by[:, None], bx[None, :]), s)
        np.add.at(bp, (by[:, None], bx[None, :]), np.ones((h, w), np.int64))
        return tuple((bs * (w * h) > s.sum() * bp).ravel())

    good = ahash(px)
    assert good != ahash(px[::-1])          # row-flip visible
    assert good != ahash(px[:, :, ::-1])    # channel-swap visible
