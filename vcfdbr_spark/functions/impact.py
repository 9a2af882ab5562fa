"""Derived impact flags — parity with pipeline/02-build-db.R:280-283.

``EXONIC_IMPACTS`` is the curated VEP consequence vocabulary at
pipeline/02-build-db.R:192-211 (public VEP terms).

Note a quirk reproduced deliberately: the reference computes
``is_exonic = biotype %in% exonic_impacts`` (:282) — i.e. it tests the
*biotype* column against a *consequence* vocabulary, which is false for
real VEP biotypes.  We reproduce that exactly by default for parity and
offer ``exonic_on_consequence=True`` for the (likely intended)
consequence-based flag.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EXONIC_IMPACTS = [
    "stop_gained",
    "exon_variant",
    "stop_lost",
    "frameshift_variant",
    "initiator_codon_variant",
    "inframe_deletion",
    "inframe_insertion",
    "missense_variant",
    "protein_altering_variant",
    "incomplete_terminal_codon_variant",
    "stop_retained_variant",
    "5_prime_UTR_premature_start_codon_variant",
    "synonymous_variant",
    "coding_sequence_variant",
    "5_prime_UTR_variant",
    "3_prime_UTR_variant",
    "transcript_ablation",
    "transcript_amplification",
    "feature_elongation",
    "feature_truncation",
]


def impact_flags(
    consequence: Column,
    impact: Column,
    biotype: Column,
    intron: Column,
    exonic_on_consequence: bool = False,
) -> dict[str, Column]:
    """The four derived booleans of ``variant_impact``
    (pipeline/02-build-db.R:280-283)."""
    exonic_src = consequence if exonic_on_consequence else biotype
    return {
        "is_lof": (impact == "HIGH") & (biotype == "protein_coding"),
        "is_splicing": consequence.rlike("splice"),
        "is_exonic": exonic_src.isin(EXONIC_IMPACTS),
        "is_intronic": intron != "",
    }
