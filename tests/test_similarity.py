"""Invariant tests for similarity operators beyond the DuckDB parity harness
(which pins exact values): semantic properties of the k-means update step."""

import numpy as np

from ocr_mini_service_spark.operators import similarity


def test_semantic_decontaminate_flags_exactly_the_benchmark_sources(spark, sf_dir):
    """Every vector whose mutant rides in the benchmark overlay must be
    flagged (cosine ~1 vs its +0.01-nudged twin survives every LSH band);
    random 64-dim pairs sit at cosine ~0 +- 0.125, so nothing else crosses
    the 0.98 threshold."""
    df = similarity.semantic_decontaminate(spark, sf_dir).toPandas()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    assert set(df["vec_id"]) == set(emb["vec_id"])  # every train vector adjudicated
    # _vecs_with_mutants mutates vec_id % 3 == 1 (filter precedes the offset)
    sources = {v for v in emb["vec_id"] if v % 3 == 1}
    flagged = set(df.loc[df["contaminated"] == 1, "vec_id"])
    assert flagged == sources
    assert (df.loc[df["contaminated"] == 1, "max_cosine"] >= 0.99).all()
    assert ((df["contaminated"] == 1) == (df["n_near_test"] > 0)).all()


def test_kmeans_step_partitions_and_averages(spark, sf_dir):
    out = similarity.kmeans_step(spark, sf_dir).toPandas()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    scaled = np.stack(emb["embedding"].map(np.asarray)).astype(np.float64) * 1000
    # away-from-zero half rounding — the engine-wide quantization rule
    q = (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(np.int64)
    ids = emb["vec_id"].to_numpy()
    dim = q.shape[1]
    # output is the full (cid, pos) grid
    assert len(out) == similarity.N_KMEANS * dim
    # assignment is a partition: per-cid counts sum to the corpus size
    at0 = out[out["pos"] == 0]
    assert at0["n_assigned"].sum() == len(emb)
    # replicate the assignment in numpy: nearest seed centroid, tie -> smaller cid
    cents = q[np.argsort(ids)][: similarity.N_KMEANS]
    cent_ids = np.sort(ids)[: similarity.N_KMEANS]
    d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = cent_ids[np.argmin(d, axis=1)]  # argmin takes first min = smaller cid
    counts = {c: int((assign == c).sum()) for c in cent_ids}
    got_counts = dict(zip(at0["cid"], at0["n_assigned"]))
    assert got_counts == counts
    # centroid values are the member means to within the 6-decimal rounding
    # half-ulp (exact values incl. the HALF_UP tie-break are pinned by the
    # DuckDB parity harness; numpy's round is HALF_EVEN so it can't replicate
    # the tie bit here)
    for cid in cent_ids:
        member_q = q[assign == cid]
        want = member_q.sum(axis=0) / len(member_q) / 1000.0
        got = out[out["cid"] == cid].sort_values("pos")["centroid"].to_numpy()
        assert np.abs(got - want).max() <= 5.001e-7


def test_embedding_hygiene_degenerate_vectors_cross_engine(spark):
    """Bad (null/NaN-component) vectors count ONLY as bad — never as
    zero-norm (a null would poison the fold into a fake zero) — and the
    oracle must not crash casting NaN; Spark and DuckDB agree row for row
    on a synthetic table that exercises every degenerate class."""
    import math

    import duckdb
    import pandas as pd

    import __spark_entry__ as entry

    rows = [
        (1, [1.0, 2.0], 0),            # normal
        (2, [0.0, 0.0], 0),            # zero-norm
        (3, [None, 2.0], 0),           # null component
        (4, [math.nan, 1.0], 1),       # NaN component
        (5, [0.0004, 0.0], 1),         # rounds to zero at x1000 quantum
        (6, [1.0, 2.0, 3.0], 1),       # ragged dim
    ]
    sdf = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    got = {
        r["label"]: tuple(r)
        for r in similarity.embedding_hygiene(spark, "", table=sdf).collect()
    }
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]),
    )
    want = {r[0]: (r[0], *r[1:]) for r in
            con.sql(entry.oracle_sql()["embedding_hygiene"]).fetchall()}
    assert got == want
    # label 0: the null-component vector is bad, NOT zero-norm
    assert got[0][1:] == (3, 1, 1, 2, 2)
    # label 1: NaN vector bad; quantized-to-zero vector IS zero-norm
    assert got[1][1:] == (3, 1, 1, 2, 3)


def test_ann_recall_audit_matches_public_topk(spark, sf_dir):
    """The audit's integer recall must equal an independent pandas
    recomputation from the public top-k outputs it grades, for BOTH
    approximate families."""
    truth = similarity.ann_bruteforce_topk(spark, sf_dir).toPandas()
    audit = (
        similarity.ann_recall_audit(spark, sf_dir)
        .toPandas()
        .set_index(["family", "query_id"])
    )
    for family, public_fn in (
        ("ivf", similarity.ann_ivf_topk),
        ("lsh", similarity.ann_lsh_buckets),
    ):
        approx = public_fn(spark, sf_dir).toPandas()
        fam = audit.loc[family]
        assert set(fam.index) == set(truth["query_id"])
        for qid, grp in truth.groupby("query_id"):
            ts = set(grp["neighbor_id"])
            aps = set(approx.loc[approx["query_id"] == qid, "neighbor_id"])
            n_hit = len(ts & aps)
            row = fam.loc[qid]
            assert row["k"] == len(ts)
            assert row["n_hit"] == n_hit, (family, qid)
            assert row["recall_bp"] == (n_hit * 10000) // len(ts)


def test_pq_encode_codes_and_seed_identity(spark, sf_dir):
    """Every vector yields PQ_M code rows with codes in [0, PQ_K); a seed
    vector (vec_id < PQ_K) is its own codebook entry, so its assignment
    distance is 0 in every subspace with code <= its own id (a smaller code
    can only win on an exact tie)."""
    import numpy as np

    df = similarity.pq_encode(spark, sf_dir).toPandas()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    assert len(df) == len(emb) * similarity.PQ_M
    assert df.groupby("vec_id").size().eq(similarity.PQ_M).all()
    assert df["subspace"].between(0, similarity.PQ_M - 1).all()
    assert df["code"].between(0, similarity.PQ_K - 1).all()
    assert (df["d"] >= 0).all()
    seeds = df[df["vec_id"] < similarity.PQ_K]
    assert (seeds["d"] == 0).all()
    assert (seeds["code"] <= seeds["vec_id"]).all()
    # numpy re-derivation of a sample of assignments
    mat = {
        r["vec_id"]: similarity._q1000(
            np.asarray(r["embedding"], dtype=np.float64)
        )
        for _, r in emb.iterrows()
    }
    S = similarity.PQ_SUB
    for _, r in df.sample(n=200, random_state=7).iterrows():
        v = mat[r["vec_id"]][r["subspace"] * S : (r["subspace"] + 1) * S]
        dists = [
            int(((v - mat[c][r["subspace"] * S : (r["subspace"] + 1) * S]) ** 2).sum())
            for c in range(similarity.PQ_K)
        ]
        best = min(range(similarity.PQ_K), key=lambda c: (dists[c], c))
        assert r["code"] == best and r["d"] == dists[best]


def test_pq_adc_distance_telescopes_from_codes(spark, sf_dir):
    """Each ADC top-k distance equals the sum over subspaces of the exact
    query-to-assigned-centroid distances recomputed in pandas from
    pq_encode + the raw embeddings."""
    import numpy as np

    topk = similarity.ann_pq_topk(spark, sf_dir).toPandas()
    enc = (
        similarity.pq_encode(spark, sf_dir)
        .toPandas()
        .set_index(["vec_id", "subspace"])["code"]
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    mat = {
        r["vec_id"]: similarity._q1000(
            np.asarray(r["embedding"], dtype=np.float64)
        )
        for _, r in emb.iterrows()
    }
    S = similarity.PQ_SUB
    for _, r in topk.iterrows():
        q, n = mat[r["query_id"]], r["neighbor_id"]
        want = sum(
            int(
                (
                    (
                        q[m * S : (m + 1) * S]
                        - mat[enc.loc[(n, m)]][m * S : (m + 1) * S]
                    )
                    ** 2
                ).sum()
            )
            for m in range(similarity.PQ_M)
        )
        assert r["adist"] == want
    # ranks are 1..TOP_K per query, ascending distance
    per = topk.groupby("query_id")
    assert per["rank"].apply(lambda s: sorted(s) == list(range(1, similarity.TOP_K + 1))).all()
    assert per.apply(lambda g: g.sort_values("rank")["adist"].is_monotonic_increasing).all()


def test_pq_recall_consistent_and_all_broadcast(spark, sf_dir):
    """The recall audit matches a pandas recomputation from the public
    outputs, and the ADC plan contains no shuffle join and no cartesian
    product (corpus scanned once as codes, everything else broadcast)."""
    import re
    from ocr_mini_service_spark.plans import formatted_plan

    truth = similarity._brute_l2_topk(spark, sf_dir).toPandas()
    approx = similarity.ann_pq_topk(spark, sf_dir).toPandas()
    audit = similarity.ann_pq_recall(spark, sf_dir).toPandas().set_index("query_id")
    assert (audit["family"] == "pq").all()
    for qid, grp in truth.groupby("query_id"):
        ts = set(grp["neighbor_id"])
        aps = set(approx.loc[approx["query_id"] == qid, "neighbor_id"])
        row = audit.loc[qid]
        assert row["k"] == len(ts)
        assert row["n_hit"] == len(ts & aps)
        assert row["recall_bp"] == (len(ts & aps) * 10000) // len(ts)
    plan = formatted_plan(similarity.ann_pq_topk(spark, sf_dir))
    assert not re.search(r"CartesianProduct|SortMergeJoin", plan), plan


def test_ivfadc_encode_structure_and_seed_identity(spark, sf_dir):
    """PQ_M rows per vector; the coarse id matches an independent numpy
    argmin; a residual-codebook seed vector (vec_id in [IVFADC_CB_LO,
    IVFADC_CB_LO + PQ_K)) is its own codebook entry, so its assignment
    distance is 0 everywhere with code <= its own band index."""
    import numpy as np

    df = similarity.ivfadc_encode(spark, sf_dir).toPandas()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    assert len(df) == len(emb) * similarity.PQ_M
    assert df["code"].between(0, similarity.PQ_K - 1).all()
    assert (df["d"] >= 0).all()
    mat = {
        r["vec_id"]: similarity._q1000(
            np.asarray(r["embedding"], dtype=np.float64)
        )
        for _, r in emb.iterrows()
    }
    cents = {c: mat[c] for c in range(similarity.N_CENTROIDS)}
    coarse = df.groupby("vec_id")["cid"].first()
    for vid, cid in coarse.items():
        dists = {c: int(((mat[vid] - q) ** 2).sum()) for c, q in cents.items()}
        want = min(dists, key=lambda c: (dists[c], c))
        assert cid == want, vid
    lo = similarity.IVFADC_CB_LO
    seeds = df[(df["vec_id"] >= lo) & (df["vec_id"] < lo + similarity.PQ_K)]
    assert (seeds["d"] == 0).all()
    assert (seeds["code"] <= seeds["vec_id"] - lo).all()


def test_ivfadc_adist_telescopes_and_stays_broadcast(spark, sf_dir):
    """Each IVFADC top-k distance equals the numpy sum over subspaces of
    query-residual-to-assigned-codebook-entry distances; neighbors come
    only from the query's probed lists; and the plan has no shuffle join
    and no cartesian product."""
    import re

    import numpy as np

    from ocr_mini_service_spark.plans import formatted_plan

    topk = similarity.ann_ivfadc_topk(spark, sf_dir).toPandas()
    enc = similarity.ivfadc_encode(spark, sf_dir).toPandas()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    mat = {
        r["vec_id"]: similarity._q1000(
            np.asarray(r["embedding"], dtype=np.float64)
        )
        for _, r in emb.iterrows()
    }
    cents = {c: mat[c] for c in range(similarity.N_CENTROIDS)}
    lo, S = similarity.IVFADC_CB_LO, similarity.PQ_SUB
    coarse = enc.groupby("vec_id")["cid"].first()
    # residual codebook rebuilt independently
    cb = {
        (m, k): (mat[lo + k] - cents[coarse.loc[lo + k]])[m * S : (m + 1) * S]
        for k in range(similarity.PQ_K)
        for m in range(similarity.PQ_M)
    }
    codes = enc.set_index(["vec_id", "subspace"])["code"]
    for qid, grp in topk.groupby("query_id"):
        dists = {c: int(((mat[qid] - q) ** 2).sum()) for c, q in cents.items()}
        probes = sorted(dists, key=lambda c: (dists[c], c))[: similarity.N_PROBE]
        for _, r in grp.iterrows():
            n = r["neighbor_id"]
            assert coarse.loc[n] in probes, (qid, n)
            rq = mat[qid] - cents[coarse.loc[n]]
            want = sum(
                int(
                    (
                        (rq[m * S : (m + 1) * S] - cb[(m, codes.loc[(n, m)])])
                        ** 2
                    ).sum()
                )
                for m in range(similarity.PQ_M)
            )
            assert r["adist"] == want, (qid, n)
    plan = formatted_plan(similarity.ann_ivfadc_topk(spark, sf_dir))
    assert not re.search(r"CartesianProduct|SortMergeJoin", plan), plan


def test_ivfadc_recall_consistent_with_public_outputs(spark, sf_dir):
    truth = similarity._brute_l2_topk(spark, sf_dir).toPandas()
    approx = similarity.ann_ivfadc_topk(spark, sf_dir).toPandas()
    audit = (
        similarity.ann_ivfadc_recall(spark, sf_dir).toPandas().set_index("query_id")
    )
    assert (audit["family"] == "ivfadc").all()
    for qid, grp in truth.groupby("query_id"):
        ts = set(grp["neighbor_id"])
        aps = set(approx.loc[approx["query_id"] == qid, "neighbor_id"])
        row = audit.loc[qid]
        assert row["k"] == len(ts)
        assert row["n_hit"] == len(ts & aps)
        assert row["recall_bp"] == (len(ts & aps) * 10000) // len(ts)


def test_inbatch_collision_audit_matches_serial_pairs(spark, sf_dir):
    """Per-batch collision counts equal the serially computed same-label
    pair counts, and vector counts close over the table."""
    from collections import Counter

    from ocr_mini_service_spark.operators import similarity as sim
    from ocr_mini_service_spark.sources import load

    got = {r["batch"]: r for r in sim.inbatch_collision_audit(spark, sf_dir).collect()}
    vecs = load(spark, sf_dir, "embeddings").select("vec_id", "label").collect()
    by_batch = {}
    for r in vecs:
        by_batch.setdefault(r["vec_id"] // sim.IN_BATCH, []).append(r["label"])
    assert set(got) == set(by_batch)
    for b, labels in by_batch.items():
        want = sum(k * (k - 1) // 2 for k in Counter(labels).values())
        assert got[b]["n_vecs"] == len(labels)
        assert got[b]["n_collisions"] == want
