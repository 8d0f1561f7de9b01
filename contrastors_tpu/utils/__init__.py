from contrastors_tpu.utils.optim import decay_mask, make_optimizer, make_schedule  # noqa: F401
from contrastors_tpu.utils.prefetch import PrefetchIterator  # noqa: F401
