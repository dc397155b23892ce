from .host_isr import host_get_ic, host_image_change
from .uda import UDAPairDataset, rcs_class_probs
from .loader import PrefetchLoader, collate
from .synthetic import SyntheticSource, SyntheticTarget

__all__ = [
    "host_get_ic", "host_image_change",
    "UDAPairDataset", "rcs_class_probs",
    "PrefetchLoader", "collate",
    "SyntheticSource", "SyntheticTarget",
]
