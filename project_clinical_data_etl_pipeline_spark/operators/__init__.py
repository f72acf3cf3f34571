from . import (  # noqa: F401
    dedup,
    encoders,
    hierarchy,
    multimodal,
    relational,
    similarity,
    text,
    validation,
)
