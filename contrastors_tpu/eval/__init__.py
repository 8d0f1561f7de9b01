from contrastors_tpu.eval.metrics import topk_accuracy, ndcg_at_k, recall_at_k  # noqa: F401
from contrastors_tpu.eval.zero_shot import zeroshot_classifier_weights, evaluate_imagenet  # noqa: F401
