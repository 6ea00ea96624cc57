"""Round-5 second-wave operators: tiered incremental dedup (batch vs
history), SemDeDup within-cell pruning, and the Gopher-style repetition
signals — planted-corpus tests that prove each tier / rule fires, beyond the
sf0.01 oracle equality of test_entry_oracle.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from tbdedup_spark.operators import ann, incremental, minhash


# --- tiered incremental dedup -------------------------------------------------

_BASE = (
    "the quick brown fox jumps over the lazy dog while the spark engine "
    "shuffles partitions across the cluster and the catalyst optimizer "
    "prunes columns from the parquet scan"
)


def _tiered_corpus(spark):
    """History 0..3; new batch 100..103 planting one of each tier."""
    hist = [
        (0, _BASE),
        (1, _BASE.replace("dog", "cat")),
        (2, "completely different history content about databases and indexes"),
        (3, "yet another unrelated history document mentioning joins"),
    ]
    new = [
        (100, _BASE),  # exact copy of 0 -> 'exact'
        (101, _BASE + " extra"),  # near-variant of 0 -> 'near'
        (102, "a brand new document that matches nothing in the corpus at all"),
        (103, _BASE),  # second exact copy: within-batch dup of 100, but the
        # verdict is vs HISTORY only -> also 'exact' (not 'unique')
    ]
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    return mk(new), mk(hist)


def test_tiered_dedup_all_three_tiers(spark):
    new_df, hist_df = _tiered_corpus(spark)
    out = incremental.tiered_dedup(new_df, hist_df, tau=0.6)
    got = {r.doc_id: r.tier for r in out.collect()}
    assert got == {100: "exact", 101: "near", 102: "unique", 103: "exact"}


def test_tiered_near_matches_allpairs_filter(spark):
    """The restricted (batch x history) band join must find exactly the
    cross pairs of the full self-join detector — the determinism argument
    the oracle relies on."""
    new_df, hist_df = _tiered_corpus(spark)
    tau = 0.6
    full, _ = minhash.minhash_pairs(
        new_df.unionByName(hist_df), "doc_id", "text", tau=tau, max_bucket=None,
        checkpoint=False,
    )
    new_ids = {100, 101, 102, 103}
    cross_near = {
        (r.a_id if r.a_id in new_ids else r.b_id)
        for r in full.collect()
        if (r.a_id in new_ids) != (r.b_id in new_ids)
    }
    out = incremental.tiered_dedup(new_df, hist_df, tau=tau)
    near_or_exact = {
        r.doc_id for r in out.collect() if r.tier in ("near", "exact")
    }
    # every cross near-pair member is flagged (as 'near' unless exact won)
    assert cross_near <= near_or_exact
    got_near = {r.doc_id for r in out.collect() if r.tier == "near"}
    exact = {r.doc_id for r in out.collect() if r.tier == "exact"}
    assert got_near == cross_near - exact


def test_tiered_dedup_precomputed_history_sigs(spark):
    """Passing history's stage-B signature table (the 100-TB path that
    removes the per-batch history shuffle) gives identical verdicts."""
    new_df, hist_df = _tiered_corpus(spark)
    hist_sigs = minhash.minhash_signatures(
        hist_df, "doc_id", "text", carry="hashes"
    )
    a = incremental.tiered_dedup(new_df, hist_df, tau=0.6)
    b = incremental.tiered_dedup(
        new_df, hist_df, tau=0.6, hist_mh_sigs=hist_sigs, checkpoint=True
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_tiered_dedup_broadcast_guard_is_plan_only(spark):
    """The guarded broadcast hints (review catch: an oversized batch must
    degrade to AQE-decided joins, not a forced-broadcast OOM) change the
    physical plan only: verdicts are identical with the hints forced off
    (threshold=0 — every bound exceeds it), forced on (None — the uncounted
    small-batch contract), and at the default."""
    new_df, hist_df = _tiered_corpus(spark)
    want = sorted(
        map(tuple, incremental.tiered_dedup(new_df, hist_df, tau=0.6).collect())
    )
    for thr in (0, None):
        got = sorted(
            map(
                tuple,
                incremental.tiered_dedup(
                    new_df, hist_df, tau=0.6, broadcast_threshold=thr
                ).collect(),
            )
        )
        assert got == want, thr


# --- SemDeDup -----------------------------------------------------------------


def test_semdedup_keep_smallest_id(spark, tmp_path):
    """Two well-separated directions; ids 1/2 are exact duplicates (cos 1)
    and 3 is a distinct member of the same cell; 10/11 duplicate each other
    in the other cell. Keep-smallest-id must prune exactly {2, 11}."""
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [2.0, 0.0, 0.0, 0.0]),  # same direction as 1 -> cos 1.0
        (3, [0.9, 0.9, 0.0, 0.0]),  # same cell, cos ~0.707 < tau
        (10, [0.0, 0.0, 1.0, 0.0]),
        (11, [0.0, 0.0, 3.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, emb array<double>")
    out_path = str(tmp_path / "asg")
    out = ann.semdedup(
        df, "vec_id", "emb", n_centroids=2, tau=0.95, seed=7,
        assignments_out_path=out_path,
    )
    got = {r.vec_id: (r.cell, r.kept) for r in out.collect()}
    assert {i for i, (_, kept) in got.items() if not kept} == {2, 11}
    # duplicates landed in the same cell; the two dup groups in different ones
    assert got[1][0] == got[2][0] and got[10][0] == got[11][0]
    assert got[1][0] != got[10][0]
    # landed assignments equal the output's cells
    landed = {
        r.vec_id: r.cell for r in spark.read.parquet(out_path).collect()
    }
    assert landed == {i: c for i, (c, _) in got.items()}


def test_semdedup_prune_is_one_shot_not_transitive(spark):
    """a~b and b~c but not a~c: one-shot rule prunes b AND c (both have a
    smaller near-dup), it does not 're-keep' c because its witness b was
    itself pruned — the documented (and SQL-mirrorable) semantics."""
    import math

    t = 24.0  # degrees apart; cos(24deg) ~ 0.913 < tau, cos(12deg) ~ 0.978
    vec = lambda deg: [math.cos(math.radians(deg)), math.sin(math.radians(deg)), 0.0]
    rows = [(1, vec(0.0)), (2, vec(t / 2)), (3, vec(t))]
    df = spark.createDataFrame(rows, "vec_id long, emb array<double>")
    out = ann.semdedup(df, "vec_id", "emb", n_centroids=1, tau=0.95, seed=7)
    got = {r.vec_id: r.kept for r in out.collect()}
    assert got == {1: True, 2: False, 3: False}


def test_semdedup_auto_k_grows_with_corpus(spark):
    """n_centroids=None scales K = ceil(n / target_cell_rows) above the
    floor: 1200 rows over 12 orthogonal directions at target 50 must land
    in many cells (K=24 requested), while a supplied small n_rows stays at
    the min_centroids floor and can only produce that many cells."""
    rows = [
        (i, [1.0 if d == i % 12 else 0.0 for d in range(12)]) for i in range(1200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, emb array<double>")
    auto = ann.semdedup(
        df, "vec_id", "emb", tau=0.99, seed=7,
        target_cell_rows=50, min_centroids=2, n_rows=1200,
    )
    floor = ann.semdedup(
        df, "vec_id", "emb", tau=0.99, seed=7,
        target_cell_rows=50, min_centroids=2, n_rows=40,
    )
    n_auto = auto.select("cell").distinct().count()
    n_floor = floor.select("cell").distinct().count()
    assert n_auto >= 8, n_auto
    assert n_floor <= 2, n_floor
    # the keep rule is K-invariant here: every direction's rows share one
    # cell under ANY clustering (argmax is a function of the vector), so the
    # 100 same-direction copies collapse to their smallest id both times
    assert auto.filter("kept").count() == 12
    assert floor.filter("kept").count() == 12


# --- repetition signals ---------------------------------------------------------


def test_repetition_scores_hand_computed(spark, tmp_path):
    import __spark_entry__ as entry_mod

    rows = [
        (0, "a a a b"),  # g2 = [a a, a a, a b]: dup 1/3; g3 dup 0; top 3/4
        (1, "x"),  # too short for any gram; top_token_frac 1.0
        (2, "p q p q p q"),  # g2 = 5 grams, 2 distinct -> dup 3/5;
        # g3 = 4 grams, 2 distinct -> dup 2/4; top 3/6
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        d + "/documents.parquet"
    )
    out = entry_mod._q_repetition_scores(spark, d)
    got = {
        r.doc_id: (r.dup_2gram_frac, r.dup_3gram_frac, r.top_token_frac)
        for r in out.collect()
    }
    assert got[0] == (round(1 / 3, 6), 0.0, 0.75)
    assert got[1] == (0.0, 0.0, 1.0)
    assert got[2] == (0.6, 0.5, 0.5)


# --- paragraph dedup + stratified sampling ------------------------------------


def test_paragraph_dedup_keep_first(spark, tmp_path):
    """Doc 20 shares its first 20-token chunk with doc 10 (the earlier doc
    wins); unshared chunks survive. Short docs form a single chunk."""
    import __spark_entry__ as entry_mod

    chunk_a = " ".join(f"w{i}" for i in range(20))
    chunk_b = " ".join(f"x{i}" for i in range(20))
    chunk_c = " ".join(f"y{i}" for i in range(20))
    rows = [
        (10, f"{chunk_a} {chunk_b}"),
        (20, f"{chunk_a} {chunk_c}"),
        (30, "tiny"),
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        d + "/documents.parquet"
    )
    out = entry_mod._q_paragraph_dedup(spark, d)
    got = {r.doc_id: (r.n_paras, r.n_kept, r.dup_para_frac) for r in out.collect()}
    assert got[10] == (2, 2, 0.0)
    assert got[20] == (2, 1, 0.5)
    assert got[30] == (1, 1, 0.0)


def test_stratified_sample_deterministic(spark):
    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    a = sorted(map(tuple, entry_mod._q_stratified_sample(spark, sf).collect()))
    b = sorted(map(tuple, entry_mod._q_stratified_sample(spark, sf).collect()))
    assert a == b and len(a) > 0
    # keep decision depends only on (doc_id, lang): kept set is a subset of
    # the input and every kept row's lang has a configured-or-default rate
    total = spark.read.parquet(sf + "/documents.parquet").count()
    assert len(a) < total


# --- tiered IMAGE dedup ---------------------------------------------------------


def test_tiered_image_dedup_matches_bruteforce(spark):
    """tiered_image_dedup's verdicts equal the brute-force ground truth
    (bytes equality for 'exact', pHash Hamming <= R for 'near') on a planted
    synth corpus split base->history / derivatives->new-batch — the exact
    split the driver query uses. Also pins the planted classes whose tier
    is certain by construction: exact/paraphrase/contain share the base's
    bytes -> 'exact'; the unrelated 'distinct' class, having no bytes match,
    must never be 'exact'."""
    from tbdedup_spark import synth

    rows = []
    for b in range(40):
        rows.extend(synth.rows_for_base(b, seed=7))
    hist = [r for r in rows if r.image_id.endswith("_00")]
    new = [r for r in rows if not r.image_id.endswith("_00")]
    assert new and hist
    mk = lambda rs: spark.createDataFrame(
        [(r.image_id, r.data, r.phash) for r in rs],
        "image_id string, bytes binary, phash long",
    )
    got = {
        r["image_id"]: r["tier"]
        for r in incremental.tiered_image_dedup(
            mk(new), mk(hist), max_hamming=7, n_bands=8
        ).collect()
    }
    assert set(got) == {r.image_id for r in new}

    hist_bytes = {r.data for r in hist}
    hist_ph = [r.phash for r in hist]
    for r in new:
        if r.data in hist_bytes:
            want = "exact"
        elif any(bin((r.phash ^ p) & (2**64 - 1)).count("1") <= 7 for p in hist_ph):
            want = "near"
        else:
            want = "unique"
        assert got[r.image_id] == want, (r.image_id, r.dup_class, got[r.image_id], want)

    by_class = {}
    for r in new:
        by_class.setdefault(r.dup_class, []).append(got[r.image_id])
    for cls in ("exact", "paraphrase", "contain"):
        assert all(t == "exact" for t in by_class.get(cls, [])), by_class.get(cls)
    assert all(t != "exact" for t in by_class.get("distinct", []))


# --- Bloom tier-0 prefilter -----------------------------------------------------


def test_bloom_prefilter_no_false_negatives_and_exact_fp_set(spark):
    """With a deliberately tiny bitmap (m=256 bits) the Bloom probe MUST
    still flag every true member (no false negatives) and its false
    positives must equal a bit-for-bit Python recomputation of the same
    md5-position algebra — i.e. the filter is deterministic and
    engine-portable, not merely 'approximately right'."""
    import hashlib

    from tbdedup_spark.operators import incremental as inc

    m, k = 256, 3
    hist_texts = [f"history document number {i} about topic {i % 7}" for i in range(40)]
    new_rows = [(100 + i, f"new crawl document {i} unlike history") for i in range(30)]
    new_rows += [(200, hist_texts[3]), (201, hist_texts[17])]  # true members

    def positions(text_val):
        sig = hashlib.sha256(text_val.encode()).hexdigest()
        return [
            int(hashlib.md5(f"{sig}:{i}".encode()).hexdigest()[:15], 16) % m
            for i in range(k)
        ]

    set_bits = {p for t in hist_texts for p in positions(t)}
    want = {
        did for did, t in new_rows if all(p in set_bits for p in positions(t))
    }
    assert {200, 201} <= want  # sanity: the members are flagged in the model

    sig = F.sha2(F.col("text"), 256)  # texts are already normalized here
    hist = spark.createDataFrame(
        [(t,) for t in hist_texts], "text string"
    ).select(sig.alias("_sig"))
    new = spark.createDataFrame(new_rows, "doc_id long, text string").select(
        F.col("doc_id").alias("_id"), sig.alias("_sig")
    )
    idx = inc.bloom_index(hist, m_bits=m, k=k)
    got = {
        r["_id"]
        for r in inc.bloom_maybe_matches(new, idx, m_bits=m, k=k).collect()
    }
    assert got == want, (sorted(got), sorted(want))
    # tiny m was chosen to actually exercise the FP path
    assert want - {200, 201}, "test corpus produced no false positives; widen it"


# --- content-defined chunking ---------------------------------------------------


def _cdc_py(t, w=16, divisor=64):
    """Python mirror of operators/cdc.py's boundary + chunk algebra."""
    import hashlib

    n = len(t)
    bs = [
        i
        for i in range(1, n + 1)
        if i == n
        or (
            i >= w
            and int(hashlib.md5(t[i - w : i].encode()).hexdigest()[:15], 16)
            % divisor
            == 0
        )
    ]
    out, p = [], 0
    for b in bs:
        out.append(t[p:b])
        p = b
    return out


def test_cdc_chunks_match_python_recomputation(spark):
    """Chunk multisets equal a bit-for-bit Python recomputation, including
    the edge docs (shorter than the window; shared paragraph across docs)."""
    import random

    from tbdedup_spark.operators import cdc

    rng = random.Random(7)
    words = ["alpha", "bravo", "carol", "delta", "echo", "fox", "golf", "hotel"]
    shared = " ".join(rng.choice(words) for _ in range(60))
    rows = [
        (0, shared + " " + " ".join(rng.choice(words) for _ in range(40))),
        (1, " ".join(rng.choice(words) for _ in range(40)) + " " + shared),
        (2, "tiny"),  # shorter than w -> one whole-doc chunk
        (3, " ".join(rng.choice(words) for _ in range(120))),
    ]
    got = {}
    inst = cdc.chunk_instances(
        spark.createDataFrame(rows, "doc_id long, text string"), w=16, divisor=64
    )
    for r in inst.collect():
        got.setdefault(r["_id"], []).append(r["chunk"])
    for did, t in rows:
        assert sorted(got[did]) == sorted(_cdc_py(t)), did
        assert "".join(_cdc_py(t)) == t  # chunks partition the doc
    # the planted shared paragraph produces cross-doc duplicate chunks
    assert set(got[0]) & set(got[1])


def test_cdc_boundaries_resync_after_edit():
    """THE content-defined property: a single-character insertion changes
    only the chunks touching the edit — boundaries re-synchronize at the
    next fingerprint hit, so nearly all chunks survive (fixed-size chunking
    would shift and invalidate every chunk after the edit)."""
    import random

    rng = random.Random(11)
    words = ["alpha", "bravo", "carol", "delta", "echo", "fox", "golf", "hotel"]
    t = " ".join(rng.choice(words) for _ in range(400))
    edited = t[:5] + "X" + t[5:]
    a, b = _cdc_py(t), _cdc_py(edited)
    common = set(a) & set(b)
    assert len(a) >= 15  # enough chunks for the property to mean something
    assert len(common) >= len(a) - 3, (len(a), len(common))
    # ...and the suffix after the first resync point is chunked identically
    assert a[-1] == b[-1]


# --- DSIR importance weights ------------------------------------------------------


def test_dsir_weights_separate_target_from_offtarget(spark, tmp_path):
    """Docs built from the target ('en') bigram vocabulary must outscore
    docs built from the off-target vocabulary, and a doc too short for any
    bigram gets exactly 0.0."""
    import __spark_entry__ as M

    en = "the model trains on clean english text with many shared bigrams"
    de = "das modell trainiert auf deutschem text mit anderen bigrammen"
    rows = [
        (0, en, "en"), (1, en + " indeed", "en"), (2, en + " truly", "en"),
        (3, de, "de"), (4, de + " wirklich", "de"),
        (5, en.replace("clean", "fresh"), "en"),
        (10, en, "de"),   # en-vocab doc labeled off-target: still scores high
        (11, de, "en"),   # the reverse
        (12, "word", "en"),  # < 2 tokens -> weight 0.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: r["dsir_logw"]
        for r in M.queries()["dsir_importance_weights"](spark, str(tmp_path)).collect()
    }
    assert got[12] == 0.0
    # every en-vocab doc above every de-vocab doc, regardless of its label
    en_docs, de_docs = [0, 1, 2, 5, 10], [3, 4, 11]
    assert min(got[i] for i in en_docs) > max(got[i] for i in de_docs), got


# --- dihedral (rotation/mirror-invariant) image near-dup ----------------------------


def test_dihedral_neardup_recovers_rotations_plain_phash_blind(spark):
    """Every planted rotated/mirrored copy is recovered, with no false
    pairs — and the SAME banded detector over stored-orientation pHashes
    only (plain pHash) finds none of them, which is the invariance the
    operator exists to add."""
    from tbdedup_spark import synth
    from tbdedup_spark.operators import multimodal, simhash
    from tbdedup_spark.session import ensure_worker_pyfiles

    ensure_worker_pyfiles(spark)
    n_orig, n_dup = 16, 8
    media = synth.rotated_corpus(spark, n_orig=n_orig, n_dup=n_dup, seed=7)
    pairs = multimodal.dihedral_near_dups(media, max_hamming=6).collect()
    found = {
        tuple(sorted((r["a_id"].split(":")[0], r["b_id"].split(":")[0])))
        for r in pairs
    }
    planted = {
        (f"im{j:04d}", f"im{n_orig + j:04d}") for j in range(n_dup)
    }
    assert found == planted, (sorted(found - planted), sorted(planted - found))

    plain = multimodal.dihedral_signatures(media).filter(
        F.substring_index("okey", ":", -1) == "0"
    )
    blind, _ = simhash.simhash_pairs(
        plain, id_col="okey", sig_col="phash", max_hamming=6,
        detector_name="plain",
    )
    plain_found = {
        tuple(sorted((r["a_id"].split(":")[0], r["b_id"].split(":")[0])))
        for r in blind.collect()
    }
    assert not (plain_found & planted), plain_found & planted


# --- quality filter chain + domain quota --------------------------------------


def test_quality_filter_chain_rule_order(spark):
    """Every rule fires on a crafted row, and rule ORDER is the contract:
    rows violating two rules must report the EARLIER one (the sf0.01 oracle
    corpus only exercises too_short/low_stopword/pass, so this covers the
    rest of the chain)."""
    import __spark_entry__ as M
    from tbdedup_spark.functions import text as T

    rows = [
        (0, "one two three"),  # 3 tokens -> too_short
        # 2001 tokens AND mtl=1: too_long must win over short_tokens
        (1, "a " * 2001),
        (2, "b c d e f g h j k l m n p q r s"),  # mtl=1 -> short_tokens
        (3, "abcdefghijkl " * 16),  # mtl=12 -> long_tokens (before low_stopword)
        (4, "ab!?cd " * 16),  # punct 2/6 per token -> punct_heavy (before low_stopword)
        (5, "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
            "kilo lima mike november oscar papa"),  # 0 stopwords -> low_stopword
        (6, "the alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar"),  # 1/16 stopwords -> pass
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    reason = T.quality_filter_reason(
        "text",
        min_tokens=M.QF_MIN_TOKENS,
        max_tokens=M.QF_MAX_TOKENS,
        min_mean_tok=M.QF_MEAN_TOK_MIN,
        max_mean_tok=M.QF_MEAN_TOK_MAX,
        max_punct=M.QF_MAX_PUNCT,
        min_stopword=M.QF_MIN_STOPWORD,
    )
    got = {r["doc_id"]: r["r"] for r in df.select("doc_id", reason.alias("r")).collect()}
    assert got == {
        0: "too_short",
        1: "too_long",
        2: "short_tokens",
        3: "long_tokens",
        4: "punct_heavy",
        5: "low_stopword",
        6: "pass",
    }, got


def test_domain_quota_sample_invariants(spark, tmp_path):
    """Data-dependent quota: a cold domain (count <= K) passes untouched
    (rate_bp = 10000), a hot domain is downsampled toward K in expectation,
    and the keep decision is a deterministic hash predicate (two runs agree
    row-for-row)."""
    import __spark_entry__ as M

    rows = [(i, "hot") for i in range(400)] + [(1000 + i, "cold") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    sf_dir = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    out1 = M.queries()["domain_quota_sample"](spark, sf_dir).collect()
    out2 = M.queries()["domain_quota_sample"](spark, sf_dir).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))

    by_lang = {}
    for r in out1:
        by_lang.setdefault(r["lang"], []).append(r)
    assert len(by_lang["cold"]) == 5
    assert all(r["rate_bp"] == 10000 for r in by_lang["cold"])
    # hot: rate_bp = 10000*100 div 400 = 2500 -> ~100 of 400 kept
    assert all(r["rate_bp"] == 2500 for r in by_lang["hot"])
    assert 60 <= len(by_lang["hot"]) <= 140, len(by_lang["hot"])


def test_pack_sequences_matches_python_recomputation(spark, tmp_path):
    """Concat-and-chunk packing manifest vs a full single-node recomputation:
    same shard assignment (md5-based hash), same within-stream order
    ((hash, doc_id)), same offsets / sequence ids / straddle flags — and the
    planted corpus is big enough that boundary straddles actually occur."""
    import hashlib

    import __spark_entry__ as M

    n_docs, toks = 50, [20, 100, 512, 513, 7]  # mixed sizes incl. == and > L
    rows = [
        (i, " ".join(f"w{j}" for j in range(toks[i % len(toks)])))
        for i in range(n_docs)
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{sf_dir}/documents.parquet")

    out1 = sorted(map(tuple, M.queries()["pack_sequences"](spark, sf_dir).collect()))
    out2 = sorted(map(tuple, M.queries()["pack_sequences"](spark, sf_dir).collect()))
    assert out1 == out2  # deterministic across runs/partitionings

    h60 = lambda s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    L, S = M.PACK_SEQ_LEN, M.PACK_SHARDS
    docs = [(i, toks[i % len(toks)], h60(f"pack:{i}")) for i in range(n_docs)]
    expected = []
    for shard in range(S):
        off = 0
        for doc_id, n, h in sorted(
            (d for d in docs if d[2] % S == shard), key=lambda d: (d[2], d[0])
        ):
            expected.append(
                (
                    doc_id,
                    shard,
                    n,
                    off,
                    off // L,
                    (off + n - 1) // L,
                    1 if (off + n - 1) // L > off // L else 0,
                )
            )
            off += n
    assert out1 == sorted(expected)
    assert any(r[6] == 1 for r in out1)  # boundary straddles exercised
    assert any(r[2] > L for r in out1)  # a doc longer than one sequence


def test_leakage_safe_split_keeps_neardup_pairs_together(spark, tmp_path):
    """Plant 60 near-dup pairs (one-character edit per twin). The cluster-keyed
    split must (a) cluster the twins, (b) never route a twin pair to opposite
    splits, while (c) the naive doc-hash split provably WOULD leak on this
    exact corpus (computed independently with hashlib) — the defect the
    operator exists to prevent."""
    import hashlib

    import __spark_entry__ as M

    base = (
        "pair{i} alpha{i} document about the engine with many shared tokens "
        "beta{i} gamma{i} delta{i} epsilon{i} zeta{i} eta{i} theta{i} "
        "iota{i} kappa{i} lam{i} mu{i} nu{i} xi{i} omicron{i} pi{i} rho{i}"
    )
    rows = []
    for i in range(60):
        t = base.format(i=i)
        rows.append((i, t))
        rows.append((1000 + i, t.replace("alpha", "alphb")))
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{sf_dir}/documents.parquet")

    out = M.queries()["leakage_safe_split"](spark, sf_dir).collect()
    split = {r["doc_id"]: r["split"] for r in out}
    cluster = {r["doc_id"]: r["cluster_id"] for r in out}
    assert len(out) == 120

    paired = [i for i in range(60) if cluster[i] == cluster[1000 + i]]
    assert len(paired) >= 55  # detector recall on the planted twins
    # the guarantee: no clustered twin pair straddles the split
    assert all(split[i] == split[1000 + i] for i in paired)
    # both destinations are actually populated on this corpus
    assert {split[d] for d in split} == {"train", "valid"}

    # counterfactual: a doc-hash split WOULD separate at least one twin pair
    h60 = lambda s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    naive = lambda d: h60(f"split:{d}") % 10000 < M.VALID_BP
    assert any(naive(i) != naive(1000 + i) for i in paired)


def test_token_budget_mix_matches_single_pass_recomputation(spark, tmp_path):
    """The two-phase distributed prefix sum (per-(lang,shard) local cumsum +
    broadcast exclusive-scan shard offsets) must equal a single-pass
    recomputation exactly, enforce prefix-truncation at the budget boundary
    (the overflowing doc is dropped even if a later smaller doc would fit),
    and be deterministic."""
    import hashlib

    import __spark_entry__ as M

    # 'en' gets many 300-token docs -> its 10000 budget binds mid-corpus;
    # 'fr' gets 3 small docs -> default budget never binds.
    rows = [(i, " ".join(f"w{j}" for j in range(300))) for i in range(60)]
    rows += [(500 + i, " ".join(f"v{j}" for j in range(50))) for i in range(3)]
    langs = ["en"] * 60 + ["fr"] * 3
    df = spark.createDataFrame(
        [(d, t, lg) for (d, t), lg in zip(rows, langs)],
        "doc_id long, text string, lang string",
    )
    sf_dir = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    out1 = sorted(map(tuple, M.queries()["token_budget_mix"](spark, sf_dir).collect()))
    out2 = sorted(map(tuple, M.queries()["token_budget_mix"](spark, sf_dir).collect()))
    assert out1 == out2

    h60 = lambda s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    S = M.MIX_SHARDS
    expected = []
    for lg, ids, n in (("en", range(60), 300), ("fr", range(500, 503), 50)):
        budget = M.MIX_BUDGET.get(lg, M.MIX_BUDGET_DEFAULT)
        acc = 0
        for doc_id, h in sorted(
            ((d, h60(f"mix:{d}")) for d in ids), key=lambda x: (x[1] % S, x[1], x[0])
        ):
            acc += n
            if acc <= budget:
                expected.append((doc_id, lg, n, acc))
    assert out1 == sorted(expected)

    en = [r for r in out1 if r[1] == "en"]
    fr = [r for r in out1 if r[1] == "fr"]
    assert len(en) == 33  # 33 * 300 = 9900 <= 10000 < 34 * 300: budget binds
    assert len(fr) == 3  # corpus exhausted before the default budget
    assert max(r[3] for r in en) == 9900


def test_countmin_matches_python_recomputation_and_merges(spark, tmp_path):
    """Full single-node recomputation of the CM_D x CM_W sketch and the
    min-over-rows estimates; the one-sided error bound (never underestimate);
    and mergeability: the sketch of corpus A+B equals the elementwise sum of
    the sketches of A and B (the property that makes the index shippable
    across shards/days)."""
    import collections
    import hashlib

    import __spark_entry__ as M

    # 26 token types, zipf-ish multiplicities, split into two "days"
    toks_a = [f"t{i}" for i in range(26) for _ in range(26 - i)]
    toks_b = [f"t{i}" for i in range(0, 26, 2) for _ in range(10)]
    mk = lambda toks, base: [(base + j, " ".join(toks[j::7])) for j in range(7)]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        mk(toks_a, 0) + mk(toks_b, 100), "doc_id long, text string"
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    out = M.queries()["countmin_heavy_hitters"](spark, sf_dir).collect()
    assert len(out) == M.CM_TOPK

    h60 = lambda s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def py_sketch(tokens):
        sk = collections.Counter()
        for t in tokens:
            for d in range(M.CM_D):
                sk[(d, h60(f"cm{d}:{t}") % M.CM_W)] += 1
        return sk

    # the parquet round-trips the same token stream the query sees
    stream = [t for j in range(7) for t in toks_a[j::7]]
    stream += [t for j in range(7) for t in toks_b[j::7]]
    sk = py_sketch(stream)
    truth = collections.Counter(stream)

    for r in out:
        est = min(sk[(d, h60(f"cm{d}:{r['tok']}") % M.CM_W)] for d in range(M.CM_D))
        assert r["est_cnt"] == est
        assert r["true_cnt"] == truth[r["tok"]]
        assert r["overcount"] == est - truth[r["tok"]] >= 0

    # top-k selection is the true total order (count desc, token)
    expect_top = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[: M.CM_TOPK]
    assert sorted(r["tok"] for r in out) == sorted(t for t, _ in expect_top)

    # mergeability: sketch(A + B) == sketch(A) + sketch(B), elementwise
    sa = py_sketch([t for j in range(7) for t in toks_a[j::7]])
    sb = py_sketch([t for j in range(7) for t in toks_b[j::7]])
    assert sk == sa + sb


def test_kmv_distinct_sketch_both_paths_and_merge(spark, tmp_path):
    """A group with fewer than KMV_K distinct values reports the exact count;
    a group with more gets the (k-1)*2^60/h_k estimate, recomputed
    independently; and the bottom-k merge rule holds: bottom-k of a union ==
    bottom-k of the concatenated per-part bottom-k's."""
    import hashlib
    import math

    import __spark_entry__ as M

    rows = [(i, f"small document number {i}", "small") for i in range(10)]
    rows += [(100 + i, f"big corpus document number {i}", "big") for i in range(300)]
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string, lang string").write.mode(
        "overwrite"
    ).parquet(f"{sf_dir}/documents.parquet")

    out = {r["lang"]: r for r in M.queries()["kmv_distinct_sketch"](spark, sf_dir).collect()}

    h60 = lambda s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    small_h = sorted({h60(f"kmv:small document number {i}") for i in range(10)})
    big_h = sorted({h60(f"kmv:big corpus document number {i}") for i in range(300)})

    # < k distinct: exact path
    assert out["small"]["true_distinct"] == 10
    assert out["small"]["est_distinct"] == 10
    # >= k distinct: estimator path, recomputed with the same float algebra
    hk = big_h[M.KMV_K - 1]
    est = math.floor(float(M.KMV_MAX) / hk * (M.KMV_K - 1))
    assert out["big"]["true_distinct"] == 300
    assert out["big"]["est_distinct"] == est
    assert abs(est - 300) / 300 < 0.5  # k=64 -> ~12.5% stderr; loose gate

    # mergeability: bottom-k(A u B) == bottom-k(bottom-k(A) + bottom-k(B))
    a, b = big_h[:200], big_h[200:]
    merged = sorted(set(sorted(a)[: M.KMV_K] + sorted(b)[: M.KMV_K]))[: M.KMV_K]
    assert merged == big_h[: M.KMV_K]
