from . import (  # noqa: F401
    dedup,
    encoders,
    hierarchy,
    multimodal,
    packing,
    relational,
    similarity,
    text,
    validation,
)
