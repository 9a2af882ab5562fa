"""Deterministic VCF-shaped derivations from the driver's TPC-H-ish
parquet tables.

Purpose: the correctness driver can only oracle-check SQL over its
pre-registered tables (region..embeddings).  To get the VCF-domain
semantics (dense ids, gt2snp recode, CSQ-style explode + flags, the
canonical filter/pull queries) under that oracle, we derive
variant-shaped tables from ``orders``/``lineitem`` with pure
deterministic integer arithmetic, expressed identically in the Spark
DataFrame API (here) and in ANSI SQL (entry_queries.ORACLE).  A value
hash match between the two proves the engine's operator semantics,
not just the arithmetic.

Derivation sketch:
- ``variant_info``  ← orders: variant_id = dense rank of o_orderkey
  (via the scalable with_dense_ids operator), chr/start/ref/alt/af/…
  from modular arithmetic on integer keys (bit-identical in any
  engine — no float noise).
- ``variant_impact`` ← lineitem ⋈ orders-key: symbol/consequence/
  impact/biotype/intron derived per line, consequences '&'-packed so
  the explode path runs.
- ``variant_geno``  ← lineitem: sample from l_suppkey, gt_raw from a
  13-way modulus over the full gt2snp input space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vcfdbr_spark.functions.genotype import gt2snp
from vcfdbr_spark.functions.impact import impact_flags
from vcfdbr_spark.operators.ids import with_dense_ids

CHR_VALUES = ["1", "2", "3", "X"]
REF_VALUES = ["A", "C", "G", "T"]
ALT_VALUES = ["G", "T", "A", "C"]
CONSEQ_VALUES = [
    "missense_variant",
    "intron_variant",
    "splice_region_variant&intron_variant",
    "synonymous_variant",
    "stop_gained&NMD_transcript_variant",
]
IMPACT_VALUES = ["HIGH", "MODERATE", "LOW"]
BIOTYPE_VALUES = ["protein_coding", "lincRNA", "processed_pseudogene"]
GT_VALUES = [
    "0|0", "0/0", "0/1", "1|0", "1|1", "1/1",
    "./.", "0/.", "./1", "1|.", "0", "1", "2/2",
]


def _pick(values: list[str], key) -> F.Column:
    expr = F.lit(values[-1])
    for i in range(len(values) - 2, -1, -1):
        expr = F.when(key == i, F.lit(values[i])).otherwise(expr)
    return expr


def sim_info_keyed(orders: DataFrame) -> DataFrame:
    """variant_info-shaped frame + the o_orderkey it derives from."""
    base = orders.select("o_orderkey")
    keyed = with_dense_ids(
        base,
        ["o_orderkey"],
        id_col="variant_id",
        bucket=F.floor(F.col("o_orderkey") / 10_000),
    )
    k = F.col("o_orderkey")
    return keyed.select(
        "variant_id",
        "o_orderkey",
        _pick(CHR_VALUES, (k % 4).cast("int")).alias("chr"),
        ((k % 999983) + 1).cast("long").alias("start"),
        ((k % 999983) + 1).cast("long").alias("end"),
        _pick(REF_VALUES, (k % 4).cast("int")).alias("ref"),
        _pick(ALT_VALUES, ((k * 11) % 4).cast("int")).alias("alt"),
        (((k % 600).cast("double") / F.lit(10.0)) + 10.0).alias("qual"),
        F.when(k % 20 == 0, "LowQual").otherwise("PASS").alias("filter"),
        (((k * 37) % 997).cast("double") / F.lit(997.0)).alias("af"),
        F.lit(5000).cast("long").alias("an"),
        ((k * 37) % 997).cast("long").alias("ac"),
    )


def sim_info(orders: DataFrame, keyed: DataFrame | None = None) -> DataFrame:
    return (keyed if keyed is not None else sim_info_keyed(orders)).drop(
        "o_orderkey"
    )


SIM_INFO_KEYED_SQL = """
  SELECT row_number() OVER (ORDER BY o_orderkey) AS variant_id,
         o_orderkey,
         CASE CAST(o_orderkey % 4 AS INT) WHEN 0 THEN '1' WHEN 1 THEN '2'
              WHEN 2 THEN '3' ELSE 'X' END AS chr,
         CAST((o_orderkey % 999983) + 1 AS BIGINT) AS start,
         CAST((o_orderkey % 999983) + 1 AS BIGINT) AS "end",
         CASE CAST(o_orderkey % 4 AS INT) WHEN 0 THEN 'A' WHEN 1 THEN 'C'
              WHEN 2 THEN 'G' ELSE 'T' END AS ref,
         CASE CAST((o_orderkey * 11) % 4 AS INT) WHEN 0 THEN 'G' WHEN 1 THEN 'T'
              WHEN 2 THEN 'A' ELSE 'C' END AS alt,
         (CAST(o_orderkey % 600 AS DOUBLE) / 10.0) + 10.0 AS qual,
         CASE WHEN o_orderkey % 20 = 0 THEN 'LowQual' ELSE 'PASS' END AS filter,
         CAST((o_orderkey * 37) % 997 AS DOUBLE) / 997.0 AS af,
         CAST(5000 AS BIGINT) AS an,
         CAST((o_orderkey * 37) % 997 AS BIGINT) AS ac
  FROM orders
"""


def sim_impact(
    orders: DataFrame, lineitem: DataFrame, keyed: DataFrame | None = None
) -> DataFrame:
    """variant_impact-shaped frame: lineitem ⋈ derived info key, then
    the reference's explode path ('&'-split) + derived flags."""
    keyed = (
        keyed if keyed is not None else sim_info_keyed(orders)
    ).select("variant_id", "o_orderkey")
    li = lineitem.select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_returnflag"
    )
    j = li.join(keyed, li.l_orderkey == keyed.o_orderkey, "inner")
    ln = F.col("l_linenumber").cast("long")
    pk = F.col("l_partkey").cast("long")
    sk = F.col("l_suppkey").cast("long")
    raw = j.select(
        "variant_id",
        F.concat(
            F.lit("G"), F.lpad(((pk % 200) + 1).cast("string"), 3, "0")
        ).alias("symbol"),
        F.when(F.col("l_returnflag") == "R", "EntrezGene")
        .otherwise("HGNC")
        .alias("symbol_source"),
        F.concat(F.lit("ENSG"), F.lpad(((pk % 200) + 1).cast("string"), 5, "0")).alias(
            "gene"
        ),
        F.concat(F.lit("ENST"), F.lpad(((pk * 7 + ln) % 1000).cast("string"), 5, "0")).alias(
            "feature"
        ),
        F.when(sk % 10 == 0, "RegulatoryFeature").otherwise("Transcript").alias(
            "feature_type"
        ),
        _pick(CONSEQ_VALUES, ((ln + pk) % 5).cast("int")).alias("consequence_packed"),
        _pick(IMPACT_VALUES, ((ln + sk) % 3).cast("int")).alias("impact"),
        _pick(BIOTYPE_VALUES, (pk % 3).cast("int")).alias("biotype"),
        F.when(sk % 4 == 0, "3/7").otherwise("").alias("intron"),
    )
    exploded = raw.withColumn(
        "consequence", F.explode(F.split(F.col("consequence_packed"), "&"))
    ).drop("consequence_packed")
    flags = impact_flags(
        F.col("consequence"), F.col("impact"), F.col("biotype"), F.col("intron")
    )
    for name, expr in flags.items():
        exploded = exploded.withColumn(name, expr)
    return exploded


SIM_IMPACT_SQL = f"""
  WITH info_keyed AS ({SIM_INFO_KEYED_SQL}),
  raw AS (
    SELECT v.variant_id,
           'G' || lpad(CAST((l.l_partkey % 200) + 1 AS VARCHAR), 3, '0') AS symbol,
           CASE WHEN l.l_returnflag = 'R' THEN 'EntrezGene' ELSE 'HGNC' END AS symbol_source,
           'ENSG' || lpad(CAST((l.l_partkey % 200) + 1 AS VARCHAR), 5, '0') AS gene,
           'ENST' || lpad(CAST((l.l_partkey * 7 + l.l_linenumber) % 1000 AS VARCHAR), 5, '0') AS feature,
           CASE WHEN l.l_suppkey % 10 = 0 THEN 'RegulatoryFeature' ELSE 'Transcript' END AS feature_type,
           CASE CAST((l.l_linenumber + l.l_partkey) % 5 AS INT)
                WHEN 0 THEN 'missense_variant'
                WHEN 1 THEN 'intron_variant'
                WHEN 2 THEN 'splice_region_variant&intron_variant'
                WHEN 3 THEN 'synonymous_variant'
                ELSE 'stop_gained&NMD_transcript_variant' END AS consequence_packed,
           CASE CAST((l.l_linenumber + l.l_suppkey) % 3 AS INT)
                WHEN 0 THEN 'HIGH' WHEN 1 THEN 'MODERATE' ELSE 'LOW' END AS impact,
           CASE CAST(l.l_partkey % 3 AS INT)
                WHEN 0 THEN 'protein_coding' WHEN 1 THEN 'lincRNA'
                ELSE 'processed_pseudogene' END AS biotype,
           CASE WHEN l.l_suppkey % 4 = 0 THEN '3/7' ELSE '' END AS intron
    FROM lineitem l JOIN info_keyed v ON l.l_orderkey = v.o_orderkey
  )
  , exploded AS (
    SELECT variant_id, symbol, symbol_source, gene, feature, feature_type,
           unnest(string_split(consequence_packed, '&')) AS consequence,
           impact, biotype, intron
    FROM raw
  )
  SELECT variant_id, symbol, symbol_source, gene, feature, feature_type,
         consequence, impact, biotype, intron,
         (impact = 'HIGH' AND biotype = 'protein_coding') AS is_lof,
         regexp_matches(consequence, 'splice') AS is_splicing,
         (biotype IN ('stop_gained','exon_variant','stop_lost','frameshift_variant',
                      'initiator_codon_variant','inframe_deletion','inframe_insertion',
                      'missense_variant','protein_altering_variant',
                      'incomplete_terminal_codon_variant','stop_retained_variant',
                      '5_prime_UTR_premature_start_codon_variant','synonymous_variant',
                      'coding_sequence_variant','5_prime_UTR_variant','3_prime_UTR_variant',
                      'transcript_ablation','transcript_amplification','feature_elongation',
                      'feature_truncation')) AS is_exonic,
         (intron <> '') AS is_intronic
  FROM exploded
"""


def sim_geno(
    orders: DataFrame, lineitem: DataFrame, keyed: DataFrame | None = None
) -> DataFrame:
    """variant_geno-shaped frame over the full gt2snp input space."""
    keyed = (
        keyed if keyed is not None else sim_info_keyed(orders)
    ).select("variant_id", "o_orderkey")
    li = lineitem.select("l_orderkey", "l_linenumber", "l_suppkey")
    j = li.join(keyed, li.l_orderkey == keyed.o_orderkey, "inner")
    gt_key = ((F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 13).cast("int")
    raw = _pick(GT_VALUES, gt_key)
    return j.select(
        "variant_id",
        F.concat(
            F.lit("S"), F.lpad((F.col("l_suppkey") % 50).cast("string"), 3, "0")
        ).alias("sample"),
        gt2snp(raw).alias("gt"),
        ((F.col("l_suppkey") * 3 + F.col("l_linenumber")) % 100)
        .cast("long")
        .alias("dp"),
        raw.alias("gt_raw"),
    )


SIM_GENO_SQL = f"""
  WITH info_keyed AS ({SIM_INFO_KEYED_SQL}),
  geno_raw AS (
    SELECT v.variant_id,
           'S' || lpad(CAST(l.l_suppkey % 50 AS VARCHAR), 3, '0') AS sample,
           CASE CAST((l.l_orderkey * 7 + l.l_linenumber) % 13 AS INT)
                WHEN 0 THEN '0|0' WHEN 1 THEN '0/0' WHEN 2 THEN '0/1'
                WHEN 3 THEN '1|0' WHEN 4 THEN '1|1' WHEN 5 THEN '1/1'
                WHEN 6 THEN './.' WHEN 7 THEN '0/.' WHEN 8 THEN './1'
                WHEN 9 THEN '1|.' WHEN 10 THEN '0' WHEN 11 THEN '1'
                ELSE '2/2' END AS gt_raw,
           CAST((l.l_suppkey * 3 + l.l_linenumber) % 100 AS BIGINT) AS dp
    FROM lineitem l JOIN info_keyed v ON l.l_orderkey = v.o_orderkey
  )
  SELECT variant_id, sample,
         CASE WHEN regexp_matches(gt_raw, '0/\\.|\\./0|0/0|0\\|0|^0$') THEN 0.0
              WHEN regexp_matches(gt_raw, '0/1|1/0|0\\|1|1\\|0|\\./1|1/\\.|\\.\\|1|1\\|\\.|^1$') THEN 1.0
              WHEN regexp_matches(gt_raw, '1/1|1\\|1') THEN 2.0
              ELSE NULL END AS gt,
         dp, gt_raw
  FROM geno_raw
"""

SIM_INFO_SQL = f"""
  SELECT variant_id, chr, start, "end", ref, alt, qual, filter, af, an, ac
  FROM ({SIM_INFO_KEYED_SQL})
"""
