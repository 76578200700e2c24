"""Extractor version string.

Recorded in every lineage row (SURVEY.md §4.2 "lineage capture") so that
checkpoint-resume only skips partitions processed by the SAME extractor
version; bumping this forces reprocessing.
"""

EXTRACTOR_VERSION = "0.1.1"  # 0.1.1: /Length-aware stream extraction
