from .datetime_formats import redshift_to_jvm_format, to_date_rs, to_timestamp_rs, to_char_rs
from .numeric import safe_cast_numeric, null_fill, nullif_empty, exact_sum

__all__ = [
    "redshift_to_jvm_format", "to_date_rs", "to_timestamp_rs", "to_char_rs",
    "safe_cast_numeric", "null_fill", "nullif_empty", "exact_sum",
]
