from datafusion_bigtable_spark.plans.composer import (
    Between,
    ComposerError,
    Eq,
    In,
    KeyRange,
    compose,
    key_range_predicate,
)

__all__ = ["Between", "ComposerError", "Eq", "In", "KeyRange", "compose", "key_range_predicate"]
