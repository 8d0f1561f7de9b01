from contrastors_tpu.data.text import (  # noqa: F401
    StreamingShardDataset,
    LocalJsonlDataset,
    TokenizeCollator,
    expand_urls,
)
