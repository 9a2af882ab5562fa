"""Deterministic VCF fixture putting the REAL parser
(``vcfdbr_spark.sources.vcf.read_vcf``) under the driver's DuckDB
oracle.

Round-1 gap (VERDICT "What's missing" #1): every ``vcfsim_*``
correctness row checked simdata derivations, never ``read_vcf``
itself.  This module generates a small but adversarial VCF — known
content, fixed path — so the driver can run the Spark ingest AND a
pure-SQL DuckDB re-parse of the same file side by side.

The fixture deliberately exercises the reference semantics that are
easy to get wrong (citations into /root/reference):

- contig-rank id ordering where string order ≠ header order
  (``chr10`` < ``chr2`` lexically; pipeline/02-build-db.R:258-259);
- multiallelic + malformed reject channel
  (pipeline/01-generate-variant-ranges-index.R:43-53);
- missing INFO fields, ``.`` QUAL, Flag-type INFO
  (pipeline/02-build-db.R:140-177);
- CSQ per-transcript explode, ``&``-explode on consequence, empty
  trailing fields, derived flags incl. the biotype quirk
  (pipeline/02-build-db.R:269-306);
- per-row FORMAT layout (reordered ``GT:AD:DP``, GT-only rows),
  multi-value AD melt to ``ad_1``/``ad_2``
  (pipeline/02-build-db.R:368-424), ``gt2snp`` recode (:101-108);
- a FORMAT field (PL) declared in the header but absent from every
  record → dropped by the first-chunk probe (:146-154).
"""

from __future__ import annotations

import os
import tempfile

# Lives inside the repo (gitignored) so the fixture never touches
# paths outside the project; the absolute path is baked into the
# oracle SQL strings at import time.
_FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".fixtures"
)
ORACLE_VCF_PATH = os.path.join(_FIXTURE_DIR, "vcf_oracle_v2.vcf")

N_VARIANTS = 240
SAMPLES = ["S0", "S1", "S2", "S3", "S4", "S5"]
CONTIGS = ["chr2", "chr10", "chrX"]  # header order != string order
MALFORMED_ROWS = {57, 171}

CSQ_DESC = (
    "Consequence annotations from Ensembl VEP. Format: "
    "Allele|Consequence|IMPACT|SYMBOL|SYMBOL_SOURCE|Gene|Feature_type"
    "|Feature|BIOTYPE|EXON|INTRON|CANONICAL"
)
_CONSEQ = [
    "missense_variant",
    "intron_variant",
    "splice_acceptor_variant",
    "synonymous_variant",
    "stop_gained&NMD_transcript_variant",
    "splice_region_variant&intron_variant",
]
_IMPACTS = ["HIGH", "MODERATE", "LOW", "MODIFIER"]
# 'missense_variant' as a BIOTYPE exercises the reference's is_exonic
# quirk (biotype tested against the consequence vocabulary, 02:282).
_BIOTYPES = ["protein_coding", "processed_transcript", "missense_variant"]
_REFS = ["A", "AT", "G", "CCA"]
_ALTS = ["G", "T", "C", "T"]
_GTS = [
    "0/0", "0|0", "0/1", "1|0", "1/1", "1|1",
    "./.", "0/.", "1/.", "2/2", ".|1", "0",
]


def _row(i: int) -> str:
    chrom = CONTIGS[i % 3]
    pos: object = 100 + (i // 3) * 13 + (i % 7)
    if i in MALFORMED_ROWS:
        pos = "NA"  # unparseable POS → reject channel
    ref = _REFS[i % 4]
    alt = "G,T" if i % 23 == 5 else _ALTS[i % 4]
    qual = "." if i % 11 == 3 else f"{30 + (i % 40)}.5"
    filt = "q10" if i % 6 == 0 else "PASS"

    info = []
    if i % 13 != 7:
        info.append(f"AC={1 + i % 3}")
    if i % 9 != 2:
        info.append(f"AF=0.{i % 997:03d}")
    info.append(f"AN={2 * len(SAMPLES)}")
    # fixed-arity array INFO (Number=4 → native array<long> column);
    # sometimes '.' (whole-field missing), sometimes short (2 of 4)
    if i % 7 != 3:
        if i % 29 == 1:
            info.append("DP4=.")
        elif i % 11 == 5:
            info.append(f"DP4={i % 40},{(i + 9) % 40}")
        else:
            info.append(
                f"DP4={i % 40},{(i + 9) % 40},{(i + 17) % 40},{(i + 23) % 40}"
            )
    if i % 4 == 0:
        info.append("DB")
    if i % 17 != 3:
        txs = []
        for t in range(1 + i % 3):
            txs.append(
                "|".join(
                    [
                        "A",
                        _CONSEQ[(i + t) % 6],
                        _IMPACTS[(i + 2 * t) % 4],
                        f"G{(i + t) % 40:03d}",
                        "EntrezGene",
                        f"ENSG{(i + t) % 40:05d}",
                        "Transcript",
                        f"ENST{i:04d}_{t}",
                        _BIOTYPES[(i + t) % 3],
                        "" if (i + t) % 2 else f"{t + 1}/5",
                        "" if (i + t) % 3 else f"{t + 1}/4",
                        "YES" if t == 0 else "",
                    ]
                )
            )
        info.append("CSQ=" + ",".join(txs))

    if i % 19 == 4:
        fmt = "GT"
    elif i % 8 == 6:
        fmt = "GT:AD:DP"  # reordered layout
    else:
        fmt = "GT:DP:AD"
    cells = []
    for s in range(len(SAMPLES)):
        gt = _GTS[(i * 7 + s * 3) % 12]
        dp = "." if (i + s) % 10 == 9 else str((i + s) % 95)
        ad = (
            "."
            if (i + s) % 13 == 12
            else f"{(i + s) % 50},{(i * (s + 1) + 3) % 50}"
        )
        by_field = {"GT": gt, "DP": dp, "AD": ad}
        cells.append(":".join(by_field[f] for f in fmt.split(":")))
    return "\t".join(
        [chrom, str(pos), ".", ref, alt, qual, filt, ";".join(info), fmt]
        + cells
    )


def vcf_text() -> str:
    lines = ["##fileformat=VCFv4.2"]
    for c in CONTIGS:
        lines.append(f"##contig=<ID={c},length=200000000>")
    lines.append('##INFO=<ID=AC,Number=A,Type=Integer,Description="ac">')
    lines.append('##INFO=<ID=AF,Number=A,Type=Float,Description="af">')
    lines.append('##INFO=<ID=AN,Number=1,Type=Integer,Description="an">')
    lines.append('##INFO=<ID=DP4,Number=4,Type=Integer,Description="dp4">')
    lines.append('##INFO=<ID=DB,Number=0,Type=Flag,Description="dbSNP">')
    lines.append(f'##INFO=<ID=CSQ,Number=.,Type=String,Description="{CSQ_DESC}">')
    lines.append('##FORMAT=<ID=GT,Number=1,Type=String,Description="gt">')
    lines.append('##FORMAT=<ID=DP,Number=1,Type=Integer,Description="dp">')
    lines.append('##FORMAT=<ID=AD,Number=R,Type=Integer,Description="ad">')
    # PL: declared but never present in any record → probe drops it
    lines.append('##FORMAT=<ID=PL,Number=G,Type=Integer,Description="pl">')
    lines.append('##FILTER=<ID=q10,Description="low qual">')
    lines.append(
        "\t".join(
            ["#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER",
             "INFO", "FORMAT"] + SAMPLES
        )
    )
    lines.extend(_row(i) for i in range(N_VARIANTS))
    return "\n".join(lines) + "\n"


def ensure_oracle_vcf() -> str:
    """Write the fixture to its fixed path (atomic, idempotent)."""
    text = vcf_text()
    try:
        with open(ORACLE_VCF_PATH, encoding="utf-8") as fh:
            if fh.read() == text:
                return ORACLE_VCF_PATH
    except OSError:
        pass
    os.makedirs(_FIXTURE_DIR, exist_ok=True)
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(ORACLE_VCF_PATH), suffix=".vcf.tmp"
    )
    with os.fdopen(fd, "w", encoding="utf-8") as fh:
        fh.write(text)
    os.replace(tmp, ORACLE_VCF_PATH)
    return ORACLE_VCF_PATH


# --------------------------------------------------------------------
# DuckDB oracle SQL — an independent pure-SQL re-parse of the fixture.
# Shared CTE prefix: whole-line read → tab split → reject filter →
# dense ids in (contig-rank, chr, start, ref, alt) order.
# --------------------------------------------------------------------

_NS = len(SAMPLES)
_CRANK = (
    "(CASE chr "
    + " ".join(f"WHEN '{c}' THEN {r}" for r, c in enumerate(CONTIGS))
    + f" ELSE {len(CONTIGS)} END)"
)

SQL_PREFIX = f"""
WITH raw AS (
  SELECT string_split(line, chr(9)) AS f
  FROM read_csv('{ORACLE_VCF_PATH}',
                columns={{'line': 'VARCHAR'}},
                delim=chr(1), header=false, quote='')
  WHERE line NOT LIKE '#%'
),
fields AS (
  SELECT f[1] AS chr, TRY_CAST(f[2] AS BIGINT) AS start,
         f[4] AS ref, f[5] AS alt, f[6] AS qual_s, f[7] AS "filter",
         f[8] AS info, f[9] AS fmt_s,
         list_slice(f, 10, {9 + _NS}) AS samples
  FROM raw
),
ok AS (
  SELECT * FROM fields
  WHERE NOT contains(alt, ',') AND start IS NOT NULL
),
ids AS (
  SELECT *, CAST(row_number() OVER (
      ORDER BY {_CRANK}, chr, start, ref, alt) AS BIGINT) AS variant_id
  FROM ok
)
"""


def _info_val(key: str) -> str:
    return (
        f"TRY_CAST(NULLIF(NULLIF(regexp_extract(';' || info, "
        f"';{key}=([^;]*)', 1), ''), '.')"
    )


SQL_VCF_INGEST_INFO = (
    SQL_PREFIX
    + f"""
SELECT variant_id, chr, start, start + length(ref) - 1 AS "end",
       ref, alt,
       CASE WHEN qual_s = '.' THEN NULL
            ELSE CAST(qual_s AS DOUBLE) END AS qual,
       "filter",
       {_info_val('AC')} AS BIGINT) AS ac,
       {_info_val('AF')} AS DOUBLE) AS af,
       {_info_val('AN')} AS BIGINT) AS an,
       NULLIF(NULLIF(regexp_extract(';' || info, ';DP4=([^;]*)', 1),
                     ''), '.') AS dp4,
       list_contains(list_transform(string_split(info, ';'),
                                    x -> string_split(x, '=')[1]),
                     'DB') AS db
FROM ids
"""
)

_EXONIC_SQL = None  # filled below (import-cycle-free)


def _exonic_in_list() -> str:
    from vcfdbr_spark.functions.impact import EXONIC_IMPACTS

    return "(" + ", ".join(f"'{c}'" for c in EXONIC_IMPACTS) + ")"


def sql_vcf_ingest_impact() -> str:
    return (
        SQL_PREFIX
        + f"""
, tx AS (
  SELECT variant_id,
         unnest(string_split(
             regexp_extract(';' || info, ';CSQ=([^;]*)', 1), ',')) AS t
  FROM ids
  WHERE regexp_extract(';' || info, ';CSQ=([^;]*)', 1) <> ''
),
cols AS (SELECT variant_id, string_split(t, '|') AS p FROM tx),
base AS (
  SELECT variant_id,
         COALESCE(p[2], '') AS consequence0,
         COALESCE(p[3], '') AS impact,
         COALESCE(p[4], '') AS symbol,
         COALESCE(p[5], '') AS symbol_source,
         COALESCE(p[6], '') AS gene,
         COALESCE(p[7], '') AS feature_type,
         COALESCE(p[8], '') AS feature,
         COALESCE(p[9], '') AS biotype,
         COALESCE(p[10], '') AS exon,
         COALESCE(p[11], '') AS intron,
         COALESCE(p[12], '') AS canonical
  FROM cols
),
ex AS (
  SELECT * EXCLUDE (consequence0),
         unnest(string_split(consequence0, '&')) AS consequence
  FROM base
)
SELECT variant_id, consequence, impact, symbol, symbol_source, gene,
       feature_type, feature, biotype, exon, intron, canonical,
       (impact = 'HIGH' AND biotype = 'protein_coding') AS is_lof,
       contains(consequence, 'splice') AS is_splicing,
       biotype IN {_exonic_in_list()} AS is_exonic,
       intron <> '' AS is_intronic
FROM ex
"""
    )


_SAMPLE_LIST = "[" + ", ".join(f"'{s}'" for s in SAMPLES) + "]"

# gt2snp regex parity (functions/genotype.py ← pipeline/02:101-108).
_GT_HOM_REF = r"0/\.|\./0|0/0|0\|0|^0$"
_GT_HET = r"0/1|1/0|0\|1|1\|0|\./1|1/\.|\.\|1|1\|\.|^1$"
_GT_HOM_ALT = r"1/1|1\|1"

SQL_VCF_INGEST_GENO = (
    SQL_PREFIX
    + f"""
, sx AS (SELECT unnest(generate_series(1, {_NS})) AS sidx),
ex AS (
  SELECT variant_id, string_split(fmt_s, ':') AS fmt, sidx,
         ({_SAMPLE_LIST})[sidx] AS sample,
         string_split(samples[sidx], ':') AS v
  FROM ids CROSS JOIN sx
),
pos AS (
  SELECT *, COALESCE(list_position(fmt, 'GT'), 0) AS pgt,
         COALESCE(list_position(fmt, 'DP'), 0) AS pdp,
         COALESCE(list_position(fmt, 'AD'), 0) AS pad
  FROM ex
),
cells AS (
  SELECT variant_id, sample,
         CASE WHEN pgt > 0 THEN v[pgt] END AS gtr,
         NULLIF(CASE WHEN pdp > 0 THEN v[pdp] END, '.') AS dps,
         string_split(NULLIF(CASE WHEN pad > 0 THEN v[pad] END, '.'),
                      ',') AS ads
  FROM pos
)
SELECT variant_id, sample,
       CASE WHEN regexp_matches(gtr, '{_GT_HOM_REF}') THEN 0.0
            WHEN regexp_matches(gtr, '{_GT_HET}') THEN 1.0
            WHEN regexp_matches(gtr, '{_GT_HOM_ALT}') THEN 2.0
       END AS gt,
       TRY_CAST(dps AS BIGINT) AS dp,
       TRY_CAST(NULLIF(ads[1], '.') AS BIGINT) AS ad_1,
       TRY_CAST(NULLIF(ads[2], '.') AS BIGINT) AS ad_2,
       gtr AS gt_raw
FROM cells
"""
)

SQL_VCF_INGEST_REJECTS = (
    SQL_PREFIX
    + """
SELECT chr, start, ref, alt,
       CASE WHEN contains(alt, ',') THEN 'multiallelic'
            ELSE 'malformed' END AS reason
FROM fields
WHERE contains(alt, ',') OR start IS NULL
"""
)
