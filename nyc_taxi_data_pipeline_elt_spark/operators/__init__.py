"""Engine operators: conformance, quality, dedup, similarity, text, multimodal."""

from nyc_taxi_data_pipeline_elt_spark.operators.conform import (  # noqa: F401
    conform_to_schema,
)
from nyc_taxi_data_pipeline_elt_spark.operators.quality import (  # noqa: F401
    Rule,
    apply_quality,
)
