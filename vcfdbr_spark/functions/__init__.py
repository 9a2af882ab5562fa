from vcfdbr_spark.functions.genotype import gt2snp
from vcfdbr_spark.functions.impact import EXONIC_IMPACTS, impact_flags

__all__ = ["gt2snp", "EXONIC_IMPACTS", "impact_flags"]
