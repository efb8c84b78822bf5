from stratum_spark.plans.pipeline import (
    Catalog,
    JoinSpec,
    PipelineResult,
    PipelineSpec,
    ValidationRule,
    compile_pipeline,
    run_pipeline,
)
from stratum_spark.plans.dag import run_dag

__all__ = [
    "Catalog",
    "JoinSpec",
    "PipelineSpec",
    "PipelineResult",
    "ValidationRule",
    "compile_pipeline",
    "run_pipeline",
    "run_dag",
]
