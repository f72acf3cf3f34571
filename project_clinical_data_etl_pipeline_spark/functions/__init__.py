from .scalars import (  # noqa: F401
    decimal_sum,
    display_string,
    first_or_default,
    hl7_field,
    not_blank_or,
    upper_initial,
)
