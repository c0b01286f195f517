"""Unit tests for extraction, dedup, vector, sessionize operators."""

import math

from pyspark.sql import functions as F

from kgflow.operators import dedup, extract, sessionize, vector
from kgflow.operators.extract import build_matcher, find_mentions


def test_matcher_longest_match_and_negatives():
    idx = build_matcher(["alpha kinase", "alpha kinase beta", "beta"])
    # longest-match wins, greedy, non-overlapping
    hits = find_mentions("see alpha kinase beta then alpha kinase and beta", idx)
    assert [h[0] for h in hits] == ["alpha kinase beta", "alpha kinase", "beta"]
    # near-miss: head word alone must not match
    assert find_mentions("alpha alone here", idx) == []
    # case-insensitive
    assert [h[0] for h in find_mentions("ALPHA KINASE", idx)] == ["alpha kinase"]


def test_extract_mentions_offsets(spark):
    tr = spark.createDataFrame(
        [("c1", 0, "user", "x alpha kinase y", None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    rows = extract.extract_mentions(tr, ["alpha kinase"]).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.surface, r.start, r.end) == ("alpha kinase", 1, 3)


def test_hash_embedding_deterministic_and_normalized(spark):
    df = spark.createDataFrame([("hello world",), ("",)], "text string")
    out = extract.hash_embedding(df, dim=16).collect()
    v = out[0].embedding
    assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-5
    assert out[1].embedding == [0.0] * 16
    out2 = extract.hash_embedding(df, dim=16).collect()
    assert out[0].embedding == out2[0].embedding


def test_exact_duplicates_groups(spark):
    docs = spark.createDataFrame(
        [(1, "Same  Text"), (2, "same text"), (3, "other")],
        "doc_id long, text string",
    )
    got = {(r.canonical_id, r.n_dups) for r in dedup.exact_duplicates(docs).collect()}
    # whitespace-normalized + lower-cased → 1 and 2 collapse
    assert got == {(1, 2), (3, 1)}


def test_minhash_finds_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different words in this one nothing shared at all here"
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    pairs = {(r.id_a, r.id_b) for r in dedup.minhash_lsh_pairs(docs).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs
    ver = dedup.jaccard_verify(docs, dedup.minhash_lsh_pairs(docs)).collect()
    row = next(r for r in ver if (r.id_a, r.id_b) == (1, 2))
    assert row.inter_size / row.union_size > 0.5


def test_simhash_similar_docs_close(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),
            (3, "one two three four five six"),
        ],
        "doc_id long, text string",
    )
    sh = {r.doc_id: r.simhash for r in dedup.simhash16(docs).collect()}

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(sh[1], sh[2]) < hamming(sh[1], sh[3])


def test_brute_force_topk_exact(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter("vec_id = 0").select(F.col("vec_id").alias("query_id"), "embedding")
    got = vector.brute_force_topk(emb, q, k=3).orderBy("rank").collect()
    assert [r.neighbor_id for r in got] == [1, 2, 3]
    assert got[0].score > 0.99


def test_lsh_topk_subset_of_brute(spark, lexicon_pdf):
    import numpy as np

    rng = np.random.RandomState(3)
    rows = [(i, rng.randn(16).astype(float).tolist()) for i in range(80)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter("vec_id < 3").select(F.col("vec_id").alias("query_id"), "embedding")
    lsh = vector.lsh_bucket_topk(emb, q, dim=16, k=5, n_planes=2)
    brute = vector.brute_force_topk(emb, q, k=80)
    bscore = {
        (r.query_id, r.neighbor_id): r.score for r in brute.collect()
    }
    for r in lsh.collect():
        # every LSH hit must carry the exact brute-force score
        assert bscore[(r.query_id, r.neighbor_id)] == r.score


def test_sessionize_gap_semantics(spark):
    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:10:00"),  # same session (10 min)
        (1, "2024-01-01 01:00:00"),  # new session (50 min gap)
        (2, "2024-01-01 00:00:00"),
    ]
    events = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    got = {r.user_id: (r.n_sessions, r.n_events) for r in
           sessionize.session_stats(events).collect()}
    assert got == {1: (2, 3), 2: (1, 1)}


def test_numpy_topk_matches_jvm_topk(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    rows = [(i, rng.randn(32).astype(np.float32).tolist()) for i in range(300)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter("vec_id < 4").select(F.col("vec_id").alias("query_id"), "embedding")
    jvm = {(r.query_id, r.rank): (r.neighbor_id, r.score)
           for r in vector.brute_force_topk(emb, q, k=5).collect()}
    npy = {(r.query_id, r.rank): (r.neighbor_id, r.score)
           for r in vector.brute_force_topk_np(emb, q, k=5).collect()}
    assert jvm == npy


def test_ivf_topk_recall(spark):
    """IVF with nprobe=4/k=8 clusters on label-clustered vectors should
    recover most of the exact top-5 (and every hit carries the exact
    brute-force score)."""
    import numpy as np

    rng = np.random.RandomState(5)
    rows = []
    for i in range(400):
        label = i % 8
        center = np.zeros(16)
        center[label * 2] = 3.0
        rows.append((i, (center + rng.randn(16) * 0.3).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter("vec_id < 5").select(F.col("vec_id").alias("query_id"), "embedding")

    cents = vector.kmeans_centroids(emb, k=8, iters=4)
    assert len(cents) == 8 and len(cents[0]) == 16

    ivf = vector.ivf_topk(emb, q, cents, k=5, nprobe=4)
    brute = vector.brute_force_topk(emb, q, k=5)
    bset = {(r.query_id, r.neighbor_id) for r in brute.collect()}
    iset = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    recall = len(bset & iset) / len(bset)
    assert recall >= 0.8, recall
    bscore = {(r.query_id, r.neighbor_id): r.score for r in brute.collect()}
    for r in ivf.collect():
        if (r.query_id, r.neighbor_id) in bscore:
            assert bscore[(r.query_id, r.neighbor_id)] == r.score


def test_embedding_neardup_bucketed_plan_and_recall(spark):
    """The production near-dup path must be an equi join on the LSH
    bucket key — no BroadcastNestedLoopJoin / cartesian over the corpus
    — and must find all identical-vector pairs (same bucket by
    construction), matching the exact verifier on them."""
    import random

    rng = random.Random(5)
    rows = []
    # 3 clusters of 4 identical vectors + 20 random vectors
    for c in range(3):
        v = [rng.uniform(-1, 1) for _ in range(16)]
        for j in range(4):
            rows.append((c * 10 + j, v))
    for i in range(20):
        rows.append((100 + i, [rng.uniform(-1, 1) for _ in range(16)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    approx = dedup.embedding_near_duplicates(emb, threshold=0.999, dim=16, n_planes=4)
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    exact = dedup.embedding_near_duplicates_exact(emb, threshold=0.999)
    got = {(r.id_a, r.id_b) for r in approx.collect()}
    want = {(r.id_a, r.id_b) for r in exact.collect()}
    assert want  # the identical-vector pairs exist
    assert got == want  # identical vectors share a bucket -> full recall here


def test_minhash_hot_bucket_cap_bounds_boilerplate(spark):
    """1k identical docs (boilerplate) without a cap produce ~500k
    candidate pairs; with max_bucket the hot buckets are dropped and the
    pair output is bounded while genuine near-dup pairs survive."""
    boiler = "subscribe to our newsletter for updates and offers every single day"
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    rows = [(i, boiler) for i in range(1000)] + [(2001, base), (2002, near)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = dedup.minhash_lsh_pairs(docs, max_bucket=10).collect()
    pairs = {(r.id_a, r.id_b) for r in capped}
    assert (2001, 2002) in pairs  # genuine near-dups survive
    # every boilerplate bucket (1000 docs) is dropped -> bounded output
    assert len(pairs) <= 10 * 10 * 4
    assert not any(a < 1000 and b < 1000 for a, b in pairs)

    # the cap is ON by default (500): the 1000-doc boilerplate bucket is
    # dropped without passing max_bucket explicitly
    default_pairs = {
        (r.id_a, r.id_b) for r in dedup.minhash_lsh_pairs(docs).collect()
    }
    assert (2001, 2002) in default_pairs
    assert not any(a < 1000 and b < 1000 for a, b in default_pairs)


def test_embedding_neardup_dim_mismatch_fails_loudly(spark):
    """ADVICE round-2: a vector whose size differs from the derived dim
    must raise, not silently collapse every row into one LSH bucket."""
    import pytest

    ok = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    # dim derived from the data: works without an explicit dim
    got = dedup.embedding_near_duplicates(ok, threshold=0.9).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(1, 2)}

    bad = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="vector size != dim"):
        dedup.embedding_near_duplicates(bad, threshold=0.9).collect()


def test_numpy_topk_string_ids(spark):
    """brute_force_topk_np must keep contract equivalence with the JVM
    variant for non-long id columns (e.g. doc-URI strings)."""
    import random

    rng = random.Random(11)
    rows = [(f"doc:{i:03d}", [rng.uniform(-1, 1) for _ in range(8)]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    q = emb.filter(F.col("vec_id") < "doc:003").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        tuple(r)
        for r in vector.brute_force_topk_np(emb, q, k=4).collect()
    }
    want = {tuple(r) for r in vector.brute_force_topk(emb, q, k=4).collect()}
    assert got == want


def test_aho_corasick_equivalence_randomized():
    """TokenAhoCorasick must reproduce the greedy first-token matcher
    exactly (leftmost-longest, non-overlapping) across adversarial
    prefix/suffix/overlap pattern sets."""
    import random

    from kgflow.operators.extract import TokenAhoCorasick

    rng = random.Random(99)
    alphabet = ["a", "b", "c", "ab", "bc"]
    for trial in range(60):
        n_pat = rng.randint(1, 12)
        pats = {
            " ".join(rng.choices(alphabet, k=rng.randint(1, 4))) for _ in range(n_pat)
        }
        surfaces = sorted(pats)
        idx = build_matcher(surfaces)
        ac = TokenAhoCorasick(surfaces)
        for _ in range(20):
            text = " ".join(rng.choices(alphabet, k=rng.randint(0, 25)))
            assert ac.find(text) == find_mentions(text, idx), (surfaces, text)


def test_aho_corasick_extract_mentions_parity(spark):
    from kgflow.operators import extract as ex

    tr = spark.createDataFrame(
        [("c1", 0, "user", "x alpha kinase beta then alpha kinase", None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    surf = ["alpha kinase", "alpha kinase beta", "beta"]
    greedy = sorted(map(tuple, ex.extract_mentions(tr, surf, matcher="greedy").collect()))
    aho = sorted(map(tuple, ex.extract_mentions(tr, surf, matcher="aho").collect()))
    assert greedy == aho and len(greedy) == 2


def test_simhash_near_pairs_equals_bruteforce(spark):
    """The banded candidate generation must find EVERY pair within the
    hamming bound (pigeonhole completeness), matching an all-pairs
    bit_count check exactly."""
    rows = [
        (i, " ".join(f"w{(i * 7 + j * (1 + i % 3)) % 23}" for j in range(12)))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_near_pairs(docs, max_hamming=2).collect()
    }
    sigs = {r.doc_id: r.simhash for r in dedup.simhash16(docs).collect()}
    ids = sorted(sigs)
    want = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sigs[a] ^ sigs[b]).count("1") <= 2
    }
    assert got == want and want  # non-vacuous: some pairs exist


def test_stratified_sample_exact_n(spark):
    from kgflow.operators import sample

    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "a")
        .when(F.col("id") % 3 == 1, "b")
        .otherwise("c")
        .alias("source"),
    )
    out5 = sample.stratified_sample_exact_n(docs, 5)
    counts = {
        r.source: r.n
        for r in out5.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"a": 5, "b": 5, "c": 5}
    # n larger than a stratum returns the whole stratum, no padding
    tiny = docs.filter("doc_id < 4")  # sources a:2, b:1, c:1
    assert sample.stratified_sample_exact_n(tiny, 5).count() == 4
    # superset chain: the 5-sample is inside the 10-sample
    s5 = {r.doc_id for r in out5.collect()}
    s10 = {r.doc_id for r in sample.stratified_sample_exact_n(docs, 10).collect()}
    assert s5 <= s10


def test_redact_pii_patterns_and_order(spark):
    """Each PII class scrubs to its typed placeholder; application
    order matters: an email inside a URL is swallowed by <URL>, and a
    dotted quad is <IP>, never half-eaten as a phone number."""
    from kgflow.functions import text as tx

    cases = {
        "mail me at bob.smith+x@sub.example.co.uk today":
            "mail me at <EMAIL> today",
        "docs at https://ex.com/a?user=a@b.com ok": "docs at <URL> ok",
        "host 192.168.0.1 up": "host <IP> up",
        "call +1 555-010-9999 now": "call <PHONE> now",
        "call 5550109999 now": "call <PHONE> now",
        "plain text stays": "plain text stays",
        "ip 10.0.0.1 then (555)010-9999": "ip <IP> then <PHONE>",
        # precision: dates / times / versions / short ids are NOT PII
        "released 2026-08-17 at 12:30": "released 2026-08-17 at 12:30",
        "version 1.2.3 and 1.22.333.4 ok": "version 1.2.3 and 1.22.333.4 ok",
        "code 12345678 ok": "code 12345678 ok",
        "id 123456789012345678 ok": "id 123456789012345678 ok",
        # a 9-15 digit bare run is indistinguishable from a phone —
        # redacting is the privacy-safe side
        "order 123456789 shipped": "order <PHONE> shipped",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "i long, t string"
    )
    got = {r.i: r.red for r in df.select("i", tx.redact_pii("t").alias("red")).collect()}
    want = dict(enumerate(cases.values()))
    assert got == want


def test_grouped_explode_equals_linked_mentions(spark):
    """The grouped fused extractor's correctness claim: exploding
    arrays_zip(term_ids, namespaces) reproduces extract_linked_mentions
    exactly (multiplicity preserved) — pinned here so the exploded-form
    baseline cannot silently rot."""
    tr = spark.createDataFrame(
        [
            ("c1", 0, "user", "alpha kinase then beta then alpha kinase", None, None),
            ("c1", 1, "asst", "beta beta gamma", None, None),
            ("c2", 0, "user", "", None, None),
            ("c2", 1, "user", "nothing relevant here", None, None),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    smap = {
        "alpha kinase": ("T1", "ns1"),
        "beta": ("T2", "ns2"),
        "gamma": ("T3_ALT", "ns1"),
    }
    cmap = {"T3_ALT": "T3"}
    flat = sorted(
        map(tuple, extract.extract_linked_mentions(tr, smap, cmap).collect())
    )
    grouped = extract.extract_linked_terms_grouped(tr, smap, cmap)
    exploded = sorted(
        map(
            tuple,
            grouped.select(
                "conv_id",
                "turn_idx",
                F.explode(F.arrays_zip("term_ids", "namespaces")).alias("_m"),
            )
            .select(
                "conv_id",
                "turn_idx",
                F.col("_m.term_ids").alias("term_id"),
                F.col("_m.namespaces").alias("namespace"),
            )
            .collect(),
        )
    )
    assert flat == exploded
    # multiplicity really is preserved (beta twice in c1 turn 1)
    assert flat.count(("c1", 1, "T2", "ns2")) == 2


def test_hash_sample_deterministic_rate_and_salt(spark):
    from kgflow.operators import sample

    docs = spark.range(8000).select(F.col("id").alias("doc_id"))
    s1 = {r.doc_id for r in sample.hash_sample(docs, 0.25).collect()}
    s2 = {r.doc_id for r in sample.hash_sample(docs, 0.25).collect()}
    assert s1 == s2  # pure function of (salt, id): reproducible
    assert 0.2 < len(s1) / 8000 < 0.3  # uniform near the target rate
    s3 = {r.doc_id for r in sample.hash_sample(docs, 0.25, salt="other").collect()}
    assert s3 != s1  # salt rotates the sample
    # nested property: a higher-rate sample contains the lower-rate one
    s4 = {r.doc_id for r in sample.hash_sample(docs, 0.5).collect()}
    assert s1 <= s4


def test_stratified_hash_sample_rates(spark):
    from kgflow.operators import sample

    docs = spark.range(6000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("source"),
    )
    out = sample.stratified_hash_sample(docs, {"a": 0.1, "b": 0.9})
    counts = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert 0.05 < counts["a"] / 3000 < 0.15
    assert 0.85 < counts["b"] / 3000 < 0.95


def test_pack_sequences_budget_semantics(spark):
    from kgflow.operators import sample

    docs = spark.createDataFrame(
        [
            # source s: tokens 3, 4, 5 — budget 6 → cum 0,3,7
            (1, "a b c", "s"),
            (2, "d e f g", "s"),
            (3, "h i j k l", "s"),
            (4, "one two", "t"),
        ],
        "doc_id long, text string, source string",
    )
    got = {
        r.doc_id: (r.bin_id, r.bin_offset, r.n_tokens)
        for r in sample.pack_sequences(docs, budget=6).collect()
    }
    assert got == {
        1: (0, 0, 3),
        2: (0, 3, 4),  # starts inside bin 0 (offset 3), spans into bin 1
        3: (1, 1, 5),  # cum=7 → bin 1, offset 1
        4: (0, 0, 2),  # independent stream
    }


def test_dedup_clusters_transitive(spark):
    """A≈B and B≈C cluster A,B,C together even though A vs C alone are
    below threshold (near-duplication is not transitive); representative
    is the min id; unrelated docs are their own singleton reps."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (10, base),
            (11, base + " extra1"),            # ≈ 10
            (12, base + " extra1 extra2 x y"),  # ≈ 11, farther from 10
            (50, "completely different text about something else entirely here"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.cluster_rep, r.is_rep)
        for r in dedup.dedup_clusters(docs, min_jaccard_pct=50).collect()
    }
    assert got[10] == (10, True)
    assert got[11] == (10, False)
    assert got[12] == (10, False)
    assert got[50] == (50, True)


def test_aho_match_set_all_occurrences():
    """match_set (the contamination-probe contract) detects every pattern
    independently — nested and overlapping patterns that the greedy
    segmentation would swallow must still be reported — and equals brute
    token-subsequence containment on randomized inputs."""
    import random

    from kgflow.operators.extract import TokenAhoCorasick

    ac = TokenAhoCorasick(["a b c", "b c", "c", "c d", "x"])
    assert ac.match_set("a b c d") == {"a b c", "b c", "c", "c d"}
    assert ac.match_set("") == set()
    assert ac.match_set("q r s") == set()

    def brute(text, pats):
        toks = text.lower().split()
        hits = set()
        for p in pats:
            pt = p.split()
            L = len(pt)
            if any(toks[i : i + L] == pt for i in range(len(toks) - L + 1)):
                hits.add(p)
        return hits

    rng = random.Random(7)
    alphabet = ["a", "b", "c", "ab", "bc"]
    for _ in range(40):
        pats = sorted(
            {" ".join(rng.choices(alphabet, k=rng.randint(1, 4))) for _ in range(10)}
        )
        ac = TokenAhoCorasick(pats)
        for _ in range(20):
            text = " ".join(rng.choices(alphabet, k=rng.randint(0, 25)))
            assert ac.match_set(text) == brute(text, pats), (pats, text)


def test_contamination_probe_ac_matches_literal_token_form(spark, tmp_path):
    """The AC probe query equals the one-scan token-boundary form (the
    padded-contains expression the oracle uses) on a corpus with nested
    probes and partial-token near-misses."""
    import __spark_entry__ as entry
    from kgflow.functions import text as tx

    docs = spark.createDataFrame(
        [
            (0, "intro to spark sql engines", "a"),
            (1, "pyspark sql near-miss: substring yes, token boundary no", "a"),
            (2, "VECTOR  INDEX and vector index merge upsert", "b"),
            (3, "the quick brown fox jumps", "b"),
            (4, "", "b"),
        ],
        "doc_id long, text string, source string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r.probe, r.n_docs)
        for r in entry.q_contamination_probe_ac(spark, str(tmp_path)).collect()
    }
    padded = F.concat(F.lit(" "), tx.normalized_text("text"), F.lit(" "))
    want = set()
    for p in entry._PROBES:
        n = docs.filter(padded.contains(f" {p} ")).count()
        want.add((p, n))
    assert got == want
    # sanity: the nested/overlap cases actually exercised the contract
    d = dict(got)
    assert d["spark sql"] == 1  # doc 0 only — "pyspark sql" is a partial token
    assert d["vector index"] == 1 and d["merge upsert"] == 1


def test_simhash64_near_pairs_equals_bruteforce(spark):
    """64-bit tier (the corpus-scale width): banded candidates at
    hamming <= 3 match an all-pairs bit_count check exactly, and the
    signature matches an independent python md5 reference (two bits per
    nibble, signed-long packing with bit 64 at weight -2^63)."""
    import hashlib

    rows = [
        (i, " ".join(f"w{(i * 7 + j * (1 + i % 3)) % 23}" for j in range(12)))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def ref_sig(text):
        toks = list(dict.fromkeys(text.lower().strip().split()))
        sums = [0] * 64
        for t in toks:
            h = hashlib.md5(t.encode()).hexdigest()
            for i in range(1, 65):
                v = int(h[(i + 1) // 2 - 1], 16)
                bit = (v >= 8) if i % 2 == 1 else ((v % 8) >= 4)
                sums[i - 1] += 1 if bit else -1
        sig = 0
        for i in range(1, 65):
            if sums[i - 1] > 0:
                sig += (1 << (i - 1)) if i < 64 else -(1 << 63)
        return sig

    want_sig = {i: ref_sig(t) for i, t in rows}
    got_sig = {r.doc_id: r.simhash for r in dedup.simhash64(docs).collect()}
    assert got_sig == want_sig

    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_near_pairs(docs, max_hamming=3, bits=64).collect()
    }
    ids = sorted(want_sig)
    mask = (1 << 64) - 1
    want = {
        (a, b, bin((want_sig[a] ^ want_sig[b]) & mask).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((want_sig[a] ^ want_sig[b]) & mask).count("1") <= 3
    }
    assert got == want and want  # non-vacuous


def test_cap_stats_match_manual(spark):
    """The hot-bucket drop reports must agree with a manual recount of
    the same banding, and n_docs_fully_excluded must equal the number
    of docs the capped PAIRING actually silences (zero surviving
    bands)."""
    from collections import Counter

    rows = [
        (i, " ".join(f"w{(i * 7 + j * (1 + i % 3)) % 23}" for j in range(12)))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cap = 3
    bands = dedup._simhash_bands(docs, "doc_id", "text", 2, 16).collect()
    cnt = Counter((r.band_id, r.band_val) for r in bands)
    hot = {k for k, n in cnt.items() if n > cap}
    per_doc_all = Counter(r.doc_id for r in bands)
    per_doc_hot = Counter(
        r.doc_id for r in bands if (r.band_id, r.band_val) in hot
    )
    want = (
        len(cnt),
        len(hot),
        sum(cnt[k] for k in hot),
        sum(1 for d, n in per_doc_all.items() if per_doc_hot.get(d, 0) == n),
    )
    r = dedup.simhash_cap_stats(docs, max_bucket=cap).first()
    got = (r.n_buckets, r.n_capped_buckets, r.n_rows_dropped, r.n_docs_fully_excluded)
    assert got == want and want[1] > 0  # the cap actually bites here
    # minhash tier: same contract
    mb = dedup._minhash_bands(docs, "doc_id", "text", 8, 2, 3).collect()
    mcnt = Counter((r.band_id, r.band_key) for r in mb)
    mhot = {k for k, n in mcnt.items() if n > cap}
    mall = Counter(r.doc_id for r in mb)
    mhotc = Counter(r.doc_id for r in mb if (r.band_id, r.band_key) in mhot)
    mwant = (
        len(mcnt),
        len(mhot),
        sum(mcnt[k] for k in mhot),
        sum(1 for d, n in mall.items() if mhotc.get(d, 0) == n),
    )
    mr = dedup.minhash_cap_stats(docs, max_bucket=cap).first()
    assert (
        mr.n_buckets, mr.n_capped_buckets, mr.n_rows_dropped,
        mr.n_docs_fully_excluded,
    ) == mwant


def test_gated_broadcast_plan(spark):
    """The mapping broadcast is size-gated: under the gate the join is
    a BroadcastHashJoin; over it no hint is applied, and with auto
    broadcast disabled the pre-execution plan falls back to a shuffle
    join (at runtime AQE would still pick broadcast when sizes allow —
    the point is that nothing FORCES a corpus-scale build side)."""
    from kgflow.operators import canon

    df = spark.range(200).select(F.col("id").cast("string").alias("x"))
    mapping = spark.range(50).select(
        F.col("id").cast("string").alias("id"),
        F.lit("c").alias("canonical_id"),
    ).localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        small = canon.apply_canonical(df, mapping, ["x"], broadcast_threshold=1000)
        big = canon.apply_canonical(df, mapping, ["x"], broadcast_threshold=10)
        never = canon.apply_canonical(df, mapping, ["x"], broadcast_threshold=None)
        plan_small = small._jdf.queryExecution().executedPlan().toString()
        plan_big = big._jdf.queryExecution().executedPlan().toString()
        plan_never = never._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastHashJoin" in plan_small
    assert "BroadcastHashJoin" not in plan_big
    assert "BroadcastHashJoin" not in plan_never
    # and the rewrite itself is unaffected by the strategy
    assert small.filter(F.col("x") == "c").count() == 50
    assert {r.x for r in big.collect()} == {r.x for r in small.collect()}


def test_paragraph_dedup_boilerplate(spark):
    """Shared boilerplate survives once (in the smallest (doc, pos)
    slot), surviving paragraphs keep document order, a document made
    entirely of already-seen paragraphs disappears, and n_kept counts
    the survivors."""
    from kgflow.operators import dedup

    boiler = "accept our cookies"
    docs = spark.createDataFrame(
        [
            (1, f"intro one\n\n{boiler}\n\nbody one"),
            (2, f"{boiler}\n\nbody two"),
            (3, f"{boiler}\n\nintro one"),  # nothing new -> dropped
            (4, "body two\n\n\n\nfresh tail"),  # empty para filtered
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.text, r.n_kept)
        for r in dedup.paragraph_dedup(docs).collect()
    }
    assert got == {
        1: (f"intro one\n\n{boiler}\n\nbody one", 3),
        2: ("body two", 1),
        4: ("fresh tail", 1),
    }


def test_source_mix_plan_and_sample(spark):
    """Mixture semantics: targets split the budget by weight;
    an under-supplied source pins rate at 1 (keeps everything); an
    unlisted source gets rate 0 (excluded); the sampler's membership
    is exactly the shared md5-threshold rule, so it composes with
    hash_sample (subset at lower rate)."""
    from kgflow.operators import sample

    rows = [
        # big: 40 docs x 10 tokens = 400 tokens
        *[(i, "big", "t " * 10) for i in range(40)],
        # small: 4 docs x 10 tokens = 40 tokens (under-supplied)
        *[(100 + i, "small", "t " * 10) for i in range(4)],
        # ghost: not in weights -> dropped
        (200, "ghost", "t " * 10),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    weights = {"big": 1.0, "small": 1.0}
    plan = {
        r.source: (r.n_tokens_total, r.target_tokens, r.rate)
        for r in sample.source_mix_plan(docs, weights, 200).collect()
    }
    assert plan["big"] == (400, 100.0, 0.25)
    assert plan["small"] == (40, 100.0, 1.0)   # under-supplied, capped
    assert plan["ghost"] == (10, 0.0, 0.0)     # unlisted, excluded
    got = sample.source_mix_sample(docs, weights, 200).collect()
    assert all(r.source != "ghost" for r in got)
    assert sum(1 for r in got if r.source == "small") == 4  # rate 1 keeps all
    big_ids = {r.doc_id for r in got if r.source == "big"}
    # identical membership rule as hash_keep at the same rate
    want_big = {
        r.doc_id
        for r in docs.filter("source = 'big'")
        .filter(sample.hash_keep("doc_id", 0.25))
        .collect()
    }
    assert big_ids == want_big
    assert all(r.n_tokens == 10 for r in got)


def test_repetition_stats(spark):
    """Hand-checked repetition profile: a boilerplate doc dominated by
    one repeated bigram scores high on both signals; a no-repeat doc
    scores 0; a sub-bigram doc is excluded; count ties break toward
    the lexicographically larger gram (matching the oracle)."""
    from kgflow.operators import quality

    docs = spark.createDataFrame(
        [
            # "spam spam spam spam": dup_frac 3/4, top bigram
            # "spam spam" x3 -> frac min(1, 3*2/4) = 1.0
            (1, "spam spam spam spam"),
            # all-distinct: dup 0; bigrams each once, tie -> "c d"
            (2, "a b c d"),
            (3, "one"),  # < 2 tokens: excluded
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (
            r.n_tokens,
            r.dup_token_frac,
            r.top_ngram,
            r.top_ngram_count,
            r.top_ngram_frac,
        )
        for r in quality.repetition_stats(docs, n=2).collect()
    }
    assert set(got) == {1, 2}
    assert got[1] == (4, 0.75, "spam spam", 3, 1.0)
    assert got[2] == (4, 0.0, "c d", 1, 0.5)


def test_quality_gate(spark):
    """Every rule fires on a crafted doc and names itself; a clean doc
    passes with empty reasons; reasons sort ascending; unknown rule
    names raise instead of being ignored."""
    import pytest as _pytest

    from kgflow.operators import quality

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy sleeping dog"),
            (2, "to be"),                      # min_tokens
            (3, "a a a a a a a a a a"),        # dup + short avg len + no-sw... 
            (4, "incomprehensibilities " * 10),  # long avg token len
            (5, "xyzzy plugh abracadabra hocus pocus quux"),  # no stopwords
        ],
        "doc_id long, text string",
    )
    rules = {
        "min_tokens": 5,
        "max_tokens": 100,
        "min_avg_token_len": 2.0,
        "max_avg_token_len": 12.0,
        "max_dup_token_frac": 0.5,
        "min_stopword_ratio": 0.01,
    }
    got = {r.doc_id: (list(r.reasons), r.keep) for r in
           quality.quality_gate(docs, rules).collect()}
    assert got[1] == ([], True)
    assert got[2] == (["min_tokens"], False)
    # doc 3: 10 tokens, dup 0.9>0.5, avg len 1<2, no stopwords ('a' is
    # not in the marker lists)
    assert got[3] == (
        ["max_dup_token_frac", "min_avg_token_len", "min_stopword_ratio"],
        False,
    )
    # doc 4: one 21-char token repeated -> long avg len AND dup 0.9
    assert got[4] == (
        ["max_avg_token_len", "max_dup_token_frac", "min_stopword_ratio"],
        False,
    )
    assert got[5] == (["min_stopword_ratio"], False)
    with _pytest.raises(ValueError, match="unknown quality rules"):
        quality.quality_gate(docs, {"min_tokenz": 1})


def test_unigram_logprob_score(spark):
    """Hand-computed unigram cross-entropy: corpus a:2 b:2 c:1 (N=5),
    lp6(a)=lp6(b)=-397940, lp6(c)=-698970; exact integer sums make the
    scores partition-order independent. OOV tokens under a separate
    fit corpus take the floor."""
    from kgflow.operators import quality

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.lm_score)
        for r in quality.unigram_logprob_score(docs).collect()
    }
    assert got[1] == (3, -0.3979)
    assert got[2] == (2, -0.5485)
    # fit on docs, score a stream containing an unseen token: floor
    stream = spark.createDataFrame([(9, "a zzz")], "doc_id long, text string")
    (row,) = quality.unigram_logprob_score(
        stream, fit_docs=docs, floor_lp6=-10_000_000
    ).collect()
    # (-397940 + -10_000_000) / 2e6 = -5.19897 -> -5.199
    assert (row.n_tokens, row.lm_score) == (2, -5.199)


def test_bigram_logprob_score(spark):
    """Hand-computed stupid-backoff bigram LM: corpus a:3 b:2 c:2
    (N=7), bigrams (a,b):2 (b,a):1 (b,c):1 (c,a):1. First token scored
    by unigram; seen bigrams by c(prev,cur)/c(prev); unseen bigrams by
    0.4*c(cur)/N with a 0.5-count floor for unseen tokens."""
    from kgflow.operators import quality

    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "c a")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.bigram_lm_score)
        for r in quality.bigram_logprob_score(docs).collect()
    }
    # doc1: lp6 = -367977 (uni a) -176091 (a,b) -301030 (b,a)
    #       -176091 (a,b) -301030 (b,c); sum/5e6 -> -0.2644
    assert got[1] == (5, -0.2644)
    # doc2: -544068 (uni c) -301030 (c,a); sum/2e6 -> -0.4225
    assert got[2] == (2, -0.4225)
    # backoff branch: fit on docs, score an unseen bigram + OOV token
    stream = spark.createDataFrame([(9, "a zzz")], "doc_id long, text string")
    (row,) = quality.bigram_logprob_score(stream, fit_docs=docs).collect()
    # -367977 (uni a) + round(log10(0.4*0.5/7)*1e6) = -1544068
    assert (row.n_tokens, row.bigram_lm_score) == (2, -0.956)


def test_multimodal_resize_framesample_audio_match_reference(spark):
    """The round-6 multimodal completions (resize / video frame-sample
    / audio frame energy) each match an independent pure-python
    reference exactly: integer fit-into-box dims + nearest-neighbor
    thumbnail off the stub grid; endpoint-inclusive k*(nf-1)//7 frame
    selection with all-frames fallback; per-frame Σx²/peak over real
    little-endian int16 PCM decode (including the |-32768| widening)."""
    from kgflow.operators import multimodal as M

    ids = list(range(40))
    d = spark.createDataFrame([(i,) for i in ids], "doc_id long")

    def pix(w, h):
        c0 = (w % 8) + 8 * (h % 8)
        base = (w // 8) * 31 + (h // 8) * 17
        return [
            200 * ((((base + c * 40503) % 97) % 2) ^ (1 if c == c0 else 0))
            for c in range(64)
        ]

    img = d.select("doc_id", M.synth_png_payload("doc_id").alias("payload"))
    got_r = {
        r.doc_id: (r.width, r.height, r.new_width, r.new_height, r.thumb)
        for r in M.image_resize(img).collect()
    }
    want_r = {}
    for i in ids:
        w, h = 64 + i % 192, 64 + (i * 7) % 128
        if w * 32 <= h * 32:
            nh = min(h, 32)
            nw = max(1, w * nh // h)
        else:
            nw = min(w, 32)
            nh = max(1, h * nw // w)
        px = pix(w, h)
        want_r[i] = (w, h, nw, nh,
                     [px[2 * tx + 16 * ty] for ty in range(4) for tx in range(4)])
    assert got_r == want_r

    vid = d.select("doc_id", M.synth_video_payload("doc_id").alias("payload"))
    got_v = {
        (r.doc_id, r.frame_idx): (r.ts_ms, r.frame_key, r.n_frames, r.fps)
        for r in M.video_frame_sample(vid).collect()
    }
    want_v = {}
    for i in ids:
        nf, fps = 10 + i % 240, 12 + (i * 3) % 18
        sel = range(nf) if nf <= 8 else sorted({k * (nf - 1) // 7 for k in range(8)})
        for fi in sel:
            want_v[(i, fi)] = (fi * 1000 // fps, (i * 1000003 + fi) % 2147483647, nf, fps)
    assert got_v == want_v

    au = d.select("doc_id", M.synth_pcm_payload("doc_id").alias("payload"))
    got_a = {
        (r.doc_id, r.frame_idx): (r.sum_sq, r.peak, r.n_samples)
        for r in M.audio_frame_energy(au).collect()
    }
    want_a = {}
    for i in ids:
        n = 512 + i % 256
        xs = [((i * 2654435761 + j * 40503) % 65536) - 32768 for j in range(n)]
        for f in range(n // 128):
            seg = xs[f * 128 : (f + 1) * 128]
            want_a[(i, f)] = (sum(v * v for v in seg), max(abs(v) for v in seg), n)
    assert got_a == want_a


def test_image_phash_matches_reference_and_bruteforce(spark):
    """Image aHash tier: the mapInPandas decode (real PNG header parse
    + stub pixel grid) matches an independent python reference
    (dims re-derived from the id, pixel/mean/packing recomputed from
    the published formulas), and the banded near-pairs at hamming <= 3
    equal an all-pairs bit_count check — same completeness bar the
    text SimHash tiers pass."""
    from kgflow.operators import multimodal

    ids = list(range(100))
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long").select(
        "doc_id", multimodal.synth_png_payload("doc_id").alias("payload")
    )

    def ref_hash(i):
        w, h = 64 + i % 192, 64 + (i * 7) % 128
        c0 = (w % 8) + 8 * (h % 8)
        base = (w // 8) * 31 + (h // 8) * 17
        px = [
            200 * ((((base + c * 40503) % 97) % 2) ^ (1 if c == c0 else 0))
            for c in range(64)
        ]
        mean = sum(px) / 64.0
        sig = sum(1 << c for c, p in enumerate(px) if p > mean)
        return sig - (1 << 64) if sig >= 1 << 63 else sig

    want_sig = {i: ref_hash(i) for i in ids}
    got = {
        r.doc_id: (r.width, r.height, r.phash)
        for r in multimodal.image_average_hash(docs).collect()
    }
    assert {i: v[2] for i, v in got.items()} == want_sig
    assert all(
        got[i][:2] == (64 + i % 192, 64 + (i * 7) % 128) for i in ids
    )

    mask = (1 << 64) - 1
    want = {
        (a, b, bin((want_sig[a] ^ want_sig[b]) & mask).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((want_sig[a] ^ want_sig[b]) & mask).count("1") <= 3
    }
    got_pairs = {
        (r.id_a, r.id_b, r.hamming)
        for r in multimodal.phash_near_pairs(docs).collect()
    }
    assert got_pairs == want and want  # non-vacuous


def test_trigram_logprob_score(spark):
    """Hand-computed pruned stupid-backoff trigram LM. Fit corpus
    "a b c a b c a b c" + "a b d": uni a:4 b:4 c:3 d:1 (N=12),
    bigrams (a,b):4 (b,c):3 (c,a):2 (b,d):1, trigrams (a,b,c):3
    (b,c,a):2 (c,a,b):2 kept, (a,b,d):1 PRUNED at min_count=2 — so
    doc2's third position must take the alpha*bigram backoff even
    though its trigram was observed at fit time."""
    from kgflow.operators import quality

    docs = spark.createDataFrame(
        [(1, "a b c a b c a b c"), (2, "a b d")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.trigram_lm_score)
        for r in quality.trigram_logprob_score(docs, prune_min_count=2).collect()
    }
    # doc1 lp6: -477121 (uni a), 0 (bigram a,b = 4/4), then trigrams
    # (a,b,c)=3/4 -> -124939, (b,c,a)=2/3 -> -176091, (c,a,b)=2/2 -> 0
    # repeating; sum -1204120 / 9e6 -> -0.1338
    assert got[1] == (9, -0.1338)
    # doc2: -477121, 0, then (a,b,d) pruned -> 0.4*c2(b,d)/c1(b) =
    # 0.4/4 = 0.1 -> -1000000; sum -1477121 / 3e6 -> -0.4924
    assert got[2] == (3, -0.4924)
    # OOV + unseen-bigram floors: fit on docs, score "d a zzz":
    # -1079181 (uni d), -875061 (0.4*4/12), -2176091 (0.16*0.5/12)
    stream = spark.createDataFrame([(9, "d a zzz")], "doc_id long, text string")
    (row,) = quality.trigram_logprob_score(stream, fit_docs=docs).collect()
    assert (row.n_tokens, row.trigram_lm_score) == (3, -1.3768)
    # prune observability on the same fit corpus
    (st,) = quality.trigram_prune_stats(docs, prune_min_count=2).collect()
    assert (st.kept_types, st.dropped_types, st.kept_mass, st.dropped_mass) == (
        3, 1, 7, 1,
    )


def test_tfidf_top_terms(spark):
    """Hand-computed TF-IDF: N=3, every term has df=2 so idf6=176091
    everywhere; doc1's doubled "a" doubles its score; equal-score
    ties break toward the smaller token."""
    from kgflow.operators import extract

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "b c")], "doc_id long, text string"
    )
    rows = {
        (r.doc_id, r.rank): (r.tok, r.tf, r.score6)
        for r in extract.tfidf_top_terms(docs, k=2).collect()
    }
    assert rows == {
        (1, 1): ("a", 2, 352182),
        (1, 2): ("b", 1, 176091),
        (2, 1): ("a", 1, 176091),  # tie with c -> smaller token first
        (2, 2): ("c", 1, 176091),
        (3, 1): ("b", 1, 176091),  # tie with c
        (3, 2): ("c", 1, 176091),
    }


def test_chunk_documents(spark):
    """Sliding windows: 10 tokens at chunk=4/stride=3 give starts
    0,3,6,9 with a 1-token tail; a doc shorter than the chunk yields
    one short chunk; default stride tiles exactly."""
    from kgflow.operators import sample

    docs = spark.createDataFrame(
        [(1, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), (2, "x y")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.chunk_idx): (r.n_chunk_tokens, r.chunk_text)
        for r in sample.chunk_documents(docs, chunk_tokens=4, stride=3).collect()
    }
    assert got == {
        (1, 0): (4, "t1 t2 t3 t4"),
        (1, 1): (4, "t4 t5 t6 t7"),
        (1, 2): (4, "t7 t8 t9 t10"),
        (1, 3): (1, "t10"),
        (2, 0): (2, "x y"),
    }
    tiled = {
        (r.doc_id, r.chunk_idx): r.chunk_text
        for r in sample.chunk_documents(
            spark.createDataFrame([(9, "a b c d e")], "doc_id long, text string"),
            chunk_tokens=2,
        ).collect()
    }
    assert tiled == {(9, 0): "a b", (9, 1): "c d", (9, 2): "e"}


def test_dedup_delta(spark):
    """Batch-vs-store dedup: exact tier catches normalized-whitespace
    copies (including sub-shingle docs, which carry NULL signatures),
    the near tier decides by >=6/8 minhash-component agreement
    computed here by an independent pure-python reference, and fresh
    docs come back unique."""
    import hashlib

    from kgflow.operators import dedup

    def sigs(text):
        t = text.lower().strip().split()
        sh = sorted(set(" ".join(t[i : i + 3]) for i in range(len(t) - 2)))
        if not sh:
            return None
        return [
            min(hashlib.md5(f"{i}|{s}".encode()).hexdigest() for s in sh)
            for i in range(8)
        ]

    store_docs = spark.createDataFrame(
        [(1, "aa bb cc dd ee"), (2, "ff gg hh ii jj"), (3, "kk ll")],
        "doc_id long, text string",
    )
    store = dedup.build_dedup_store(store_docs)
    new = spark.createDataFrame(
        [
            (10, "AA  bb cc dd ee"),      # exact after normalization
            (11, "ff gg hh ii jj kk"),    # superstring of doc 2
            (12, "zz yy xx ww vv"),       # fresh
            (13, "kk  LL"),               # exact copy of the short doc
            (14, "kk ll mm"),             # one novel shingle, no match
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.status, r.dup_of)
        for r in dedup.dedup_delta(new, store).collect()
    }
    m11 = sum(
        a == b for a, b in zip(sigs("ff gg hh ii jj kk"), sigs("ff gg hh ii jj"))
    )
    exp11 = ("near", 2) if m11 >= 6 else ("unique", None)
    assert got[10] == ("exact", 1)
    assert got[11] == exp11
    assert got[12] == ("unique", None)
    assert got[13] == ("exact", 3)
    assert got[14] == ("unique", None)
    # the test is only meaningful if the near tier actually fired
    assert got[11][0] == "near", f"agreement {m11}/8 — adjust fixture"


def test_dedup_delta_store_maintenance(spark):
    """The maintained-store loop: after appending batch 1's unique
    survivors' store rows, batch 2 copies of those docs are caught as
    exact dups OF THE BATCH-1 IDS — dedup state accumulates across
    drops without ever rescanning text."""
    from kgflow.operators import dedup

    store = dedup.build_dedup_store(
        spark.createDataFrame([(1, "aa bb cc dd ee")], "doc_id long, text string")
    )
    batch1 = spark.createDataFrame(
        [(20, "pp qq rr ss tt"), (21, "aa bb cc dd ee")],
        "doc_id long, text string",
    )
    r1 = {r.doc_id: r.status for r in dedup.dedup_delta(batch1, store).collect()}
    assert r1 == {20: "unique", 21: "exact"}
    survivors = batch1.join(
        dedup.dedup_delta(batch1, store).filter("status = 'unique'").select("doc_id"),
        "doc_id",
    )
    store2 = store.unionByName(dedup.build_dedup_store(survivors))
    batch2 = spark.createDataFrame(
        [(30, "pp qq rr ss tt")], "doc_id long, text string"
    )
    (r2,) = dedup.dedup_delta(batch2, store2).collect()
    assert (r2.status, r2.dup_of) == ("exact", 20)
