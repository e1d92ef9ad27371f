"""Custom operators Spark lacks natively, composed from DataFrame ops
(SURVEY.md §7: preference order is (1) built-in composition,
(2) applyInPandas/mapInPandas, (3) mapPartitions)."""
