"""End-to-end job plans: the extraction pipeline with per-partition lineage
and checkpoint-resume (the north_rule's job structure)."""

from pdf_extractor_spark.plans.lineage import LineageLog
from pdf_extractor_spark.plans.extract_plan import run_extract

__all__ = ["LineageLog", "run_extract"]
