from .dq import SensorRules, split_valid_invalid
from .enrich import derive_event_times, enrich_with_dim
from .topk import top_k, top_k_per_group

__all__ = [
    "SensorRules",
    "split_valid_invalid",
    "derive_event_times",
    "enrich_with_dim",
    "top_k",
    "top_k_per_group",
]
