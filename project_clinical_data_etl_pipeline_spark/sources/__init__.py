from .readers import read_json_docs, read_scalar_text, read_table  # noqa: F401
from .writers import write_json, write_parquet, write_text  # noqa: F401
