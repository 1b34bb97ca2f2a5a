from .predicates import (  # noqa: F401
    FilterType,
    compile_filter,
    compile_filter_sql,
    filter_columns,
    validate_filter_dict,
)
