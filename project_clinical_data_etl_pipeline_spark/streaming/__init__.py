from .incremental import (  # noqa: F401
    hourly_counts_batch_equivalent,
    run_hourly_counts_stream,
    run_watermarked_append_stream,
)
