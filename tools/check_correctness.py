"""Local replica of the driver's correctness gate: run each
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same sf dir; compare row count, schema (sorted column names), and
an order-insensitive value comparison.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
       python tools/check_correctness.py --json OUT.json [sf_dir] [query ...]
       python tools/check_correctness.py --sf1 [--json OUT.json] [query ...]

``--json`` also writes a driver-style artifact: one record per query
with rows_match / schema_match / hash_match / spark_rows /
oracle_rows / err, so a full-surface local run can be committed
alongside the driver's (possibly row-capped) CORRECTNESS_r*.json.

``--sf1`` is the SCALE-TIER gate (r10 verdict item 1): round 9
shipped a connected-components bug that returned 488 wrong keep_ids
at sf1 while passing every sf0.01/sf0.1 oracle — iterative/component
algorithms have scale-DEPENDENT correctness (round counts, caps,
convergence) that small fixtures cannot exercise.  This mode derives
the deterministic sf1 dataset via tools/make_sf1.py if absent
(default /tmp/sf1, override $SPARK_GRAFT_SF1_DIR) and value-verifies
the queries whose answers depend on iteration/convergence behavior
(:data:`SF1_QUERIES`) against the same DuckDB oracles at 10x the
largest shipped sf.  The resulting CORRECTNESS_SF1_r*.json is a
committed per-round artifact alongside BENCH_sf1.

At scale tiers the doc-side connected-component keys
(:data:`SCALE_PY_CC_KEYS`) swap the registry's recursive-CTE closure
oracle for a python union-find + keep-policy replay over the SAME
DuckDB linear stages — the closure itself is quadratic in component
size and stops being a usable oracle exactly when the scale tier
matters (sf5: >100 CPU-min / 36 GB inside one component).  The two
oracle forms are pinned equal at sf0.01 by
tests/test_registry_contract.py.  The gate dir honors
$SPARK_GRAFT_SF1_DIR, so higher tiers run as e.g.
``SPARK_GRAFT_SF1_DIR=/tmp/sf5 ... --sf1 --json CORRECTNESS_SF5_r*.json``
(derive /tmp/sf5 via ``tools/make_sf1.py --out /tmp/sf5 --copies 50``).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

#: the scale-dependent family: connected components (round count /
#: convergence), its three consumers, the incremental probe, and the
#: capped paths (cap + adaptive band width are corpus-size-driven)
SF1_QUERIES = [
    "dedup_clusters",
    "corpus_dedup",
    "semantic_dedup",
    "semantic_dedup_capped",
    "embedding_dup_pairs",
    "embedding_dup_pairs_recall",
    "embedding_dedup_incremental",
    "embedding_cap_skew",
    "corpus_filter",
    "dedup_incremental",
    "dedup_keep_best",
    # data-derived-threshold family: domain_mix computes its md5
    # keep-thresholds from corpus-wide sums; the sf1 row proves the
    # fixed IEEE-double nesting stays bit-identical between engines
    # on 10x-larger exact BIGINT sums (and that the kept mixture
    # converges to the targets at scale).
    "domain_mix",
    # cross-split decontamination: candidate sets depend on band
    # bucket populations (corpus-size-dependent) and the per-side
    # caps — the same class of scale-dependent answer as the CC/
    # banding family above.
    "decontaminate_splits",
    "decontaminate_batch",
    # quality_prune's keep counts are data-derived (ceil(n_g·num/den)
    # over per-domain counts) — the sf1 row proves the integer-
    # rational arithmetic and the two-phase rank agree with the
    # oracle on 10x-larger domains.
    "quality_prune",
    # corpus_overlap's union estimate is floor(double((k−1)·H)/h_max)
    # with a >2^53 numerator — the sf1 row proves the IEEE nesting
    # stays bit-identical between engines when 10x more distinct
    # hashes move h_max (and that the merged sketch stays full).
    "corpus_overlap",
    # heavy_ngrams' candidate set is the md5-sampled subcorpus's
    # top-200 — a corpus-size-dependent boundary (which near-ties
    # clear the cut changes with the sample), the same class of
    # scale-dependent answer as the capped/banded keys above; the
    # scale rows prove the two-pass policy mirrors exactly when the
    # sample is 10-50x bigger.
    "heavy_ngrams",
]

#: streaming ops are outside the registry (no SQL oracle), so the
#: sf1 gate checks them against a PROPERTY oracle instead: streaming
#: the corpus in micro-batches must yield exactly the candidate-pair
#: set of one-shot batch banding at the same parameters (a different
#: code path: per-batch probe + index accumulation vs one self-join).
#: Valid as exact equality because no sf1 bucket reaches the hot cap
#: (max minhash bucket 102, max sign bucket 8, cap 500) — cap-firing
#: behavior is pinned separately by unit fixtures.
SF1_STREAM_CHECKS = [
    "stream_fuzzy_dedup_vs_batch",
    "stream_semantic_dedup_vs_batch",
    "stream_corpus_filter_vs_replay",
    # streaming KMV maintenance must equal the one-shot batch sketch
    # EXACTLY (deterministic monotone fold) at sf1's distinct-text
    # count — the unit fixture covers ~100 values; this covers 10^4
    "stream_sketch_vs_batch",
]

#: persisted-IVF-index lifecycle under drift at TIER scale (r12
#: verdict item 4): the unit drift test (tests/test_cli_plans.py::
#: test_ivf_drift_signal_and_reindex) is 160 vectors; this gate row
#: drives the sf-tier embeddings corpus (20k at sf1 / 100k at sf5)
#: through build → healthy → planted off-distribution append →
#: signal fires → queries still exact vs the non-indexed operator
#: under the FROZEN centroids → `ivf-reindex --if-signaled` retrains
#: transactionally → queries exact under the FRESH centroids, no
#: vectors lost.
SF1_LIFECYCLE_CHECKS = ["ivf_drift_reindex"]

SF1_DEFAULT_DIR = "/tmp/sf1"

#: Doc-side connected-component keys whose REGISTRY oracle closes the
#: candidate graph with a recursive transitive closure (reach(src,dst)
#: materializes O(sum |comp|^2) rows).  Exact and cheap at sf0.01
#: (components of a handful of docs), pathological at scale tiers:
#: the derived corpora's jittered-copy families chain into
#: thousand-member components (sf1's max is 558; sf5's ~5x that), and
#: a single closure sat >100 CPU-minutes / 36 GB in DuckDB at sf5.
#: At scale tiers these keys keep DuckDB for every LINEAR stage
#: (shingle/sign/band SQL, hot-bucket caps, candidate pairs,
#: quality/LM gates — the same fragments the registry oracle uses)
#: and replace ONLY the closure with a pure-Python union-find +
#: keep-policy replay: a genuinely independent algorithm, and the
#: same oracle family the r10 CC rewrite was verified against at sf1.
#: The embedding-side CC keys (semantic_dedup*) stay on the SQL
#: closure — their components are shallow at every tested tier
#: (sf5 measured: 73-93s in DuckDB, passing).
SCALE_PY_CC_KEYS = {
    "dedup_clusters",
    "corpus_dedup",
    "dedup_keep_best",
    "corpus_filter",
}


def _uf_min_labels(pairs) -> dict:
    """Union-find over (a, b) pairs → {node: min id of its component}."""
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups: dict = {}
    for n in parent:
        groups.setdefault(find(n), []).append(n)
    labels: dict = {}
    for members in groups.values():
        m = min(members)
        for n in members:
            labels[n] = m
    return labels


def _py_cc_expected(name: str, con) -> pd.DataFrame:
    """Expected frame for a SCALE_PY_CC_KEYS key: DuckDB pairs (and
    gates) + python union-find + the key's documented keep policy."""
    from vcfdbr_spark.entry_queries import (
        _BANDS_SQL,
        _CF_MAX_BITS,
        _CF_MIN_TOKENS,
        _CF_MIN_TTR,
        _PAIRS_SQL,
        SQL_LM_SCORE,
    )
    from vcfdbr_spark.operators.dedup import DEFAULT_MAX_BUCKET_SIZE

    if name == "corpus_filter":
        passing_sql = f"""
        WITH lm AS ({SQL_LM_SCORE}),
        qual AS (
          SELECT doc_id, lang, source,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                 round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                       / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS ttr
          FROM documents)
        SELECT q.doc_id, q.lang, q.source, q.n_tokens, q.ttr,
               lm.bits_per_bigram
        FROM qual q JOIN lm USING (doc_id)
        WHERE q.n_tokens >= {_CF_MIN_TOKENS}
          AND q.ttr >= {_CF_MIN_TTR}
          AND lm.bits_per_bigram <= {_CF_MAX_BITS}
        """
        con.execute(
            "CREATE OR REPLACE TEMP TABLE _cf_passing AS " + passing_sql
        )
        passing = con.execute("SELECT * FROM _cf_passing").df()
        pairs = con.execute(f"""
        WITH surv_bands AS (
          SELECT doc_id, band, bucket FROM ({_BANDS_SQL})
          WHERE doc_id IN (SELECT doc_id FROM _cf_passing)),
        surv_capped AS (
          SELECT doc_id, band, bucket FROM (
            SELECT doc_id, band, bucket,
                   COUNT(*) OVER (PARTITION BY band, bucket) AS bn
            FROM surv_bands)
          WHERE bn <= {DEFAULT_MAX_BUCKET_SIZE})
        SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        FROM surv_capped x JOIN surv_capped y
          ON x.band = y.band AND x.bucket = y.bucket
         AND x.doc_id < y.doc_id
        """).fetchall()
        labels = _uf_min_labels(pairs)
        drops = {n for n, k in labels.items() if n != k}
        return passing[~passing["doc_id"].isin(drops)].reset_index(drop=True)

    pairs = con.execute(_PAIRS_SQL).fetchall()
    labels = _uf_min_labels(pairs)
    if name == "dedup_clusters":
        return pd.DataFrame(
            sorted(labels.items()), columns=["doc_id", "keep_id"]
        )
    if name == "corpus_dedup":
        drops = {n for n, k in labels.items() if n != k}
        docs = con.execute(
            "SELECT doc_id, lang, source, n_chars FROM documents"
        ).df()
        return docs[~docs["doc_id"].isin(drops)].reset_index(drop=True)
    if name == "dedup_keep_best":
        nchars = dict(
            con.execute("SELECT doc_id, n_chars FROM documents").fetchall()
        )
        groups: dict = {}
        for n, root in labels.items():
            groups.setdefault(root, []).append(n)
        rows = []
        for members in groups.values():
            # ORDER BY n_chars DESC, doc_id ASC — ties keep the min id
            best = max(members, key=lambda n: (nchars[n], -n))
            rows.extend((n, best) for n in members)
        return pd.DataFrame(sorted(rows), columns=["doc_id", "keep_id"])
    raise KeyError(name)


def _stream_vs_batch_record(spark, sf_dir: str, flavor: str) -> dict:
    """Run one streaming dedup flavor over the sf corpus split into 4
    parquet files (maxFilesPerTrigger=1 → 4 micro-batches) and compare
    its accumulated pair set against one-shot batch banding."""
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from vcfdbr_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_band_buckets,
        minhash_signatures,
    )

    work = tempfile.mkdtemp(prefix=f"sf1_stream_{flavor}_")
    try:
        if flavor == "fuzzy":
            from vcfdbr_spark.streaming.ingest import stream_fuzzy_dedup

            src_df = spark.read.parquet(
                os.path.join(sf_dir, "documents.parquet")
            ).select("doc_id", "text")
            schema = "doc_id long, text string"
            src_df.repartition(4).write.parquet(f"{work}/src")
            stream_fuzzy_dedup(
                spark, f"{work}/src/*.parquet", f"{work}/out",
                schema=schema, max_files_per_trigger=1,
            )
            batch = lsh_candidate_pairs(
                minhash_band_buckets(minhash_signatures(src_df))
            )
        else:
            from vcfdbr_spark.operators.similarity import (
                adaptive_band_bits,
                adaptive_band_count,
                embedding_band_index,
            )
            from vcfdbr_spark.streaming.ingest import stream_semantic_dedup

            src_df = spark.read.parquet(
                os.path.join(sf_dir, "embeddings.parquet")
            ).select(
                "vec_id",
                F.col("embedding").cast("array<float>").alias("embedding"),
            )
            # pin the adaptive policy at the FULL corpus size on both
            # sides — the comparison exercises sf1's own band width
            bits = adaptive_band_bits(src_df.count())
            n_bands = adaptive_band_count(bits, 0.95)
            schema = "vec_id long, embedding array<float>"
            src_df.repartition(4).write.parquet(f"{work}/src")
            stream_semantic_dedup(
                spark, f"{work}/src/*.parquet", f"{work}/out",
                schema=schema, bits=bits, n_bands=n_bands,
                max_files_per_trigger=1,
            )
            batch = lsh_candidate_pairs(
                embedding_band_index(src_df, bits=bits, n_bands=n_bands),
                "vec_id",
            )
        stream_pairs = {
            (r["a"], r["b"])
            for r in spark.read.parquet(f"{work}/out/pairs")
            .select("a", "b").collect()
        }
        batch_pairs = {(r["a"], r["b"]) for r in batch.collect()}
        ok = stream_pairs == batch_pairs
        err = None
        if not ok:
            err = (
                f"stream-only: {len(stream_pairs - batch_pairs)}, "
                f"batch-only: {len(batch_pairs - stream_pairs)}"
            )
        return {
            "rows_match": len(stream_pairs) == len(batch_pairs),
            "schema_match": True,
            "hash_match": ok,
            "spark_rows": len(stream_pairs),
            "oracle_rows": len(batch_pairs),
            "err": err,
            "oracle": "property: one-shot batch banding",
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _stream_sketch_record(spark, sf_dir: str) -> dict:
    """Stream the sf corpus in 4 micro-batches through stream_sketch
    and require the persisted sketch to equal the one-shot
    kmv_bottom_k of the whole corpus, hash for hash."""
    import shutil
    import tempfile

    from vcfdbr_spark.operators.sketch import kmv_bottom_k
    from vcfdbr_spark.streaming.ingest import (
        read_stream_sketch,
        stream_sketch,
    )

    k = 512
    work = tempfile.mkdtemp(prefix="sf1_stream_sketch_")
    try:
        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).select("doc_id", "text")
        docs.repartition(4).write.parquet(f"{work}/src")
        stream_sketch(
            spark, f"{work}/src/*.parquet", f"{work}/out",
            k=k, max_files_per_trigger=1,
        )
        got, _ = read_stream_sketch(spark, f"{work}/out")
        stream_hs = [r["h"] for r in got.collect()]
        batch_hs = [r["h"] for r in kmv_bottom_k(docs, "text", k).collect()]
        ok = stream_hs == batch_hs
        return {
            "rows_match": len(stream_hs) == len(batch_hs),
            "schema_match": True,
            "hash_match": ok,
            "spark_rows": len(stream_hs),
            "oracle_rows": len(batch_hs),
            "err": None if ok else "sketch mismatch vs one-shot batch",
            "oracle": "property: one-shot batch bottom-k",
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _ivf_drift_record(spark, sf_dir: str) -> dict:
    """See :data:`SF1_LIFECYCLE_CHECKS`.  The planted drift is the
    hottest stored centroid's direction scaled 10x with +-0.05
    deterministic jitter — decisively nearest that one frozen
    centroid, so |corpus|/8 appended vectors pile into a single
    inverted list and max/median crosses the documented 8x signal by
    construction.  Post-reindex the gate asserts CORRECTNESS (the
    lifecycle's contract: drift and retrain may change pruning
    economics, never answers) plus full vector survival; it does NOT
    assert the signal clears — whether k-means can re-balance a
    point-mass hot region is a corpus property, pinned at unit scale
    on a deliberately splittable corpus."""
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from vcfdbr_spark.cli import main as cli_main
    from vcfdbr_spark.operators.similarity import (
        ivf_imbalance,
        ivf_topk,
        ivf_topk_indexed,
        read_ivf_centroids,
        write_ivf_index,
    )

    nlist, jitter_mod = 64, 101
    work = tempfile.mkdtemp(prefix="sf1_ivf_drift_")
    path = f"{work}/index"
    try:
        emb = spark.read.parquet(
            os.path.join(sf_dir, "embeddings.parquet")
        ).select(
            "vec_id",
            F.col("embedding").cast("array<float>").alias("embedding"),
        )
        n = emb.count()
        write_ivf_index(emb, path, nlist=nlist, n_iter=2)
        healthy = ivf_imbalance(spark, path).first()
        if healthy["reindex_signal"]:
            return {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None,
                "err": f"index unhealthy before drift: {healthy}",
                "oracle": "property: lifecycle pre/post reindex",
            }
        # hottest list's centroid = the drift target
        hot_list = (
            spark.read.parquet(path).groupBy("cent_id")
            .count().orderBy(F.desc("count"), "cent_id").first()["cent_id"]
        )
        cstar = [
            float(x)
            for x in read_ivf_centroids(spark, path)
            .filter(F.col("vec_id") == hot_list)
            .first()["embedding"]
        ]
        base_arr = F.array(*[F.lit(10.0 * x) for x in cstar])
        drift = spark.range(n // 8).select(
            (F.lit(800_000_000) + F.col("id")).cast("long").alias("vec_id"),
            F.transform(
                base_arr,
                lambda x, i: (
                    x
                    + (
                        F.pmod(
                            F.xxhash64(F.col("id"), i), F.lit(jitter_mod)
                        )
                        - F.lit(jitter_mod // 2)
                    ).cast("double")
                    / F.lit(1000.0)
                ).cast("float"),
            ).alias("embedding"),
        )
        write_ivf_index(
            drift, path,
            centroids=read_ivf_centroids(spark, path), mode="append",
        )
        drifted = ivf_imbalance(spark, path).first()
        if not drifted["reindex_signal"]:
            return {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None,
                "err": f"planted drift did not fire the signal: {drifted}",
                "oracle": "property: lifecycle pre/post reindex",
            }
        full = emb.unionByName(drift)
        queries = emb.filter(
            (F.col("vec_id") % 2_000 == 0) & (F.col("vec_id") < 20_000)
        )

        def topk_pair():
            want = sorted(map(tuple, ivf_topk(
                full, queries, k=5, nprobe=3,
                centroids=read_ivf_centroids(spark, path),
            ).collect()))
            got = sorted(map(tuple, ivf_topk_indexed(
                spark, path, queries, k=5, nprobe=3,
            ).collect()))
            return want, got

        want_pre, got_pre = topk_pair()
        if want_pre != got_pre:
            return {
                "rows_match": len(got_pre) == len(want_pre),
                "schema_match": True, "hash_match": False,
                "spark_rows": len(got_pre), "oracle_rows": len(want_pre),
                "err": "drifted index answers != non-indexed operator",
                "oracle": "property: lifecycle pre/post reindex",
            }
        # the signal-gated CLI path IS the production trigger; retrain
        # under the SAME list budget (the drift grew the corpus 12.5%,
        # not past the nlist sizing) — fresh centroids redistribute
        # the natural mass so the median recovers even though k-means
        # cannot split the planted point-mass itself (documented
        # above; splitting is pinned at unit scale)
        rc = cli_main(["ivf-reindex", "--index", path, "--if-signaled"])
        n_after = spark.read.parquet(path).count()
        want_post, got_post = topk_pair()
        ok = (
            rc == 0
            and n_after == n + n // 8
            and want_post == got_post
        )
        return {
            "rows_match": n_after == n + n // 8,
            "schema_match": True,
            "hash_match": ok,
            "spark_rows": len(got_post),
            "oracle_rows": len(want_post),
            "err": None if ok else (
                f"post-reindex: rc={rc}, vectors {n_after} vs "
                f"{n + n // 8}, topk match={want_post == got_post}"
            ),
            "oracle": "property: lifecycle pre/post reindex "
                      f"(imbalance {drifted['imbalance']} -> "
                      f"{ivf_imbalance(spark, path).first()['imbalance']})",
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def ensure_sf1_dir() -> str:
    """Deterministic sf1 derivation (make_sf1.py is pure in its
    inputs, so a rebuild reproduces the dataset bit-for-bit)."""
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", SF1_DEFAULT_DIR)
    if not os.path.exists(os.path.join(sf1, "documents.parquet")):
        tool = os.path.join(os.path.dirname(os.path.abspath(__file__)), "make_sf1.py")
        subprocess.run([sys.executable, tool, "--out", sf1], check=True)
    return sf1


def table_scan(sf_dir: str, table: str) -> str:
    """parquet_scan pattern for one table: the shipped sf dirs are
    single files, derived dirs (make_sf1.py, Spark writers) are
    directories of part files."""
    path = f"{sf_dir}/{table}.parquet"
    return f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype) in ("int32", "int16", "int8", "uint32"):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _stream_corpus_filter_record(spark, sf_dir: str) -> dict:
    """Layered verification of the streaming capstone's KEEP layer:
    run ``stream_corpus_filter`` (no-LM config; the model path is
    unit-tested) over the sf corpus in 4 micro-batches, then replay
    the documented first-seen-wins policy in pure Python (union-find
    per batch) over (a) the quality-survivor set recomputed
    INDEPENDENTLY in DuckDB with the registered oracle's gate
    expressions and (b) the engine's own per-batch pair partitions —
    the pair layer is itself verified against one-shot batch banding
    by ``stream_fuzzy_dedup_vs_batch``, so together the two checks
    cover the full path with no Spark code trusted twice."""
    import shutil
    import tempfile
    from collections import defaultdict

    work = tempfile.mkdtemp(prefix="sf1_stream_cf_")
    try:
        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).select("doc_id", "text", "lang", "source")
        docs.repartition(4).write.parquet(f"{work}/src")
        from vcfdbr_spark.streaming.ingest import stream_corpus_filter

        stream_corpus_filter(
            spark, f"{work}/src/*.parquet", f"{work}/out",
            max_files_per_trigger=1,
        )
        kept_spark = {
            r["doc_id"]
            for r in spark.read.parquet(f"{work}/out/kept")
            .select("doc_id").collect()
        }
        idx = spark.read.option("basePath", f"{work}/out/band_index").parquet(
            f"{work}/out/band_index"
        )
        doc_batch = {
            r["doc_id"]: r["batch"]
            for r in idx.select("doc_id", "batch").distinct().collect()
        }
        pairs = [
            (r["a"], r["b"], r["batch"])
            for r in spark.read.option("basePath", f"{work}/out/pairs")
            .parquet(f"{work}/out/pairs").collect()
        ]
        # independent survivor set: the registered oracle's gates
        con2 = duckdb.connect()
        surv = {
            r[0]
            for r in con2.execute(
                f"""
                SELECT doc_id FROM parquet_scan({table_scan(sf_dir, 'documents')})
                WHERE CAST(len(string_split(text, ' ')) AS BIGINT) >= 20
                  AND round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                        / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) >= 0.3
                """
            ).fetchall()
        }
        if set(doc_batch) != surv:
            return {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(doc_batch),
                "oracle_rows": len(surv),
                "err": "indexed set != independent quality-survivor set",
                "oracle": "property: python replay of first-seen-wins",
            }
        kept_py: set = set()
        for bn in sorted(set(doc_batch.values())):
            sb = {d for d, b in doc_batch.items() if b == bn}
            inb = [(a, b) for a, b, pb in pairs
                   if pb == bn and a in sb and b in sb]
            crossp = [(a, b) for a, b, pb in pairs
                      if pb == bn and ((a in sb) != (b in sb))]
            matched = {a if a in sb else b for a, b in crossp}
            parent = {d: d for d in sb}

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a, b in inb:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            comps = defaultdict(set)
            for d in sb:
                comps[find(d)].add(d)
            for mem in comps.values():
                if not (mem & matched):
                    kept_py.add(min(mem))
        ok = kept_spark == kept_py
        return {
            "rows_match": len(kept_spark) == len(kept_py),
            "schema_match": True,
            "hash_match": ok,
            "spark_rows": len(kept_spark),
            "oracle_rows": len(kept_py),
            "err": None if ok else (
                f"spark-only: {len(kept_spark - kept_py)}, "
                f"replay-only: {len(kept_py - kept_spark)}"
            ),
            "oracle": "property: python replay of first-seen-wins",
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    sf1_mode = False
    while argv and argv[0] in ("--json", "--sf1"):
        if argv[0] == "--json":
            json_out = argv[1]
            argv = argv[2:]
        else:
            sf1_mode = True
            argv = argv[1:]
    if sf1_mode:
        sf_dir = ensure_sf1_dir()
        only = set(argv) or (
            set(SF1_QUERIES)
            | set(SF1_STREAM_CHECKS)
            | set(SF1_LIFECYCLE_CHECKS)
        )
    else:
        sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
        only = set(argv[1:])
    import __spark_entry__ as e
    from vcfdbr_spark import get_spark

    spark = get_spark(extra_conf={"spark.ui.enabled": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan({table_scan(sf_dir, t)})"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    records: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = normalize(fn(spark, sf_dir).toPandas())
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures.append(name)
            records[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None, "err": f"spark: {ex}"[:300],
            }
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows={len(got)} (no oracle, rows-only check) [{t_spark:.1f}s]")
            records[name] = {
                "rows_match": None, "schema_match": None,
                "hash_match": None, "spark_rows": len(got),
                "oracle_rows": None, "err": None,
            }
            continue
        t0 = time.time()
        py_oracle = sf1_mode and name in SCALE_PY_CC_KEYS
        try:
            if py_oracle:
                want = normalize(_py_cc_expected(name, con))
            else:
                want = normalize(con.execute(oracles[name]).df())
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {ex}")
            failures.append(name)
            records[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(got),
                "oracle_rows": None, "err": f"oracle: {ex}"[:300],
            }
            continue
        t_duck = time.time() - t0
        status = []
        if len(got) != len(want):
            status.append(f"ROWS {len(got)} vs {len(want)}")
        if list(got.columns) != list(want.columns):
            status.append(f"SCHEMA {list(got.columns)} vs {list(want.columns)}")
        if not status:
            if got.shape == want.shape:
                try:
                    pd.testing.assert_frame_equal(
                        got, want, check_dtype=False, check_exact=True
                    )
                except AssertionError as ex:
                    status.append(f"VALUES {str(ex).splitlines()[-1][:160]}")
        records[name] = {
            "rows_match": len(got) == len(want),
            "schema_match": list(got.columns) == list(want.columns),
            "hash_match": not status,
            "spark_rows": len(got),
            "oracle_rows": len(want),
            "err": "; ".join(status) if status else None,
        }
        if py_oracle:
            records[name]["oracle"] = (
                "python: union-find + policy replay over DuckDB "
                "linear stages (closure-free at scale tiers)"
            )
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            failures.append(name)
        else:
            print(
                f"PASS {name}: rows={len(got)} cols={len(got.columns)} "
                f"[spark {t_spark:.1f}s, duckdb {t_duck:.1f}s]"
            )
    if sf1_mode:
        for name in SF1_STREAM_CHECKS:
            if only and name not in only:
                continue
            t0 = time.time()
            try:
                if name == "stream_corpus_filter_vs_replay":
                    rec = _stream_corpus_filter_record(spark, sf_dir)
                elif name == "stream_sketch_vs_batch":
                    rec = _stream_sketch_record(spark, sf_dir)
                else:
                    flavor = "fuzzy" if "fuzzy" in name else "semantic"
                    rec = _stream_vs_batch_record(spark, sf_dir, flavor)
            except Exception as ex:
                rec = {
                    "rows_match": False, "schema_match": False,
                    "hash_match": False, "spark_rows": None,
                    "oracle_rows": None, "err": f"stream: {ex}"[:300],
                    "oracle": "property: one-shot batch banding",
                }
            records[name] = rec
            if rec["hash_match"]:
                print(
                    f"PASS {name}: pairs={rec['spark_rows']} == batch "
                    f"[{time.time() - t0:.1f}s]"
                )
            else:
                print(f"FAIL {name}: {rec['err']}")
                failures.append(name)
        for name in SF1_LIFECYCLE_CHECKS:
            if only and name not in only:
                continue
            t0 = time.time()
            try:
                rec = _ivf_drift_record(spark, sf_dir)
            except Exception as ex:
                rec = {
                    "rows_match": False, "schema_match": False,
                    "hash_match": False, "spark_rows": None,
                    "oracle_rows": None, "err": f"lifecycle: {ex}"[:300],
                    "oracle": "property: lifecycle pre/post reindex",
                }
            records[name] = rec
            if rec["hash_match"]:
                print(
                    f"PASS {name}: {rec['oracle']} "
                    f"[{time.time() - t0:.1f}s]"
                )
            else:
                print(f"FAIL {name}: {rec['err']}")
                failures.append(name)
    n_run = len(records)
    print(f"\n{n_run - len(failures)}/{n_run} passed")
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(records, fh, indent=2)
        print(f"wrote {json_out} ({len(records)} queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
