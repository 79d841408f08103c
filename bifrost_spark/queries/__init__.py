"""Importing this package registers every query into bifrost_spark.registry."""

import bifrost_spark.queries.relational  # noqa: F401
import bifrost_spark.queries.relational_ext  # noqa: F401
import bifrost_spark.queries.relational_ext2  # noqa: F401
import bifrost_spark.queries.analytics  # noqa: F401
import bifrost_spark.queries.parity  # noqa: F401
import bifrost_spark.queries.llm_text  # noqa: F401
import bifrost_spark.queries.llm_dedup  # noqa: F401
import bifrost_spark.queries.llm_similarity  # noqa: F401
import bifrost_spark.queries.multimodal  # noqa: F401
import bifrost_spark.queries.scale_ops  # noqa: F401
import bifrost_spark.queries.tpch  # noqa: F401
import bifrost_spark.queries.llm_clean  # noqa: F401
import bifrost_spark.queries.llm_web  # noqa: F401
import bifrost_spark.queries.pipeline_ops  # noqa: F401
import bifrost_spark.queries.curation_ops  # noqa: F401
import bifrost_spark.queries.eval_stats  # noqa: F401
import bifrost_spark.queries.robust_stats  # noqa: F401
import bifrost_spark.queries.monitor_ops  # noqa: F401
import bifrost_spark.queries.dist_tests  # noqa: F401
import bifrost_spark.queries.experiment_ops  # noqa: F401
import bifrost_spark.queries.corpus_stats  # noqa: F401
import bifrost_spark.queries.survival_ops  # noqa: F401
import bifrost_spark.queries.calibration_ops  # noqa: F401
