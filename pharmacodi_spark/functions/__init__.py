from pharmacodi_spark.functions.scalar import (
    strip_version_suffix,
    strip_file_suffix,
    recode,
    clamp_expr,
    round8,
)

__all__ = [
    "strip_version_suffix",
    "strip_file_suffix",
    "recode",
    "clamp_expr",
    "round8",
]
