from .grad_utils import global_norm, mix_grads, mix_grads_stacked
from .inner_loop import make_adapt_fn, make_inner_optimizer
from .maml import MetaMetrics, make_maml_step, make_metatest_fn
from .reptile import ReptileMetrics, make_reptile_step

__all__ = [
    "global_norm",
    "mix_grads",
    "mix_grads_stacked",
    "make_adapt_fn",
    "make_inner_optimizer",
    "MetaMetrics",
    "make_maml_step",
    "make_metatest_fn",
    "ReptileMetrics",
    "make_reptile_step",
]
