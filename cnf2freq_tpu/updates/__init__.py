from .capped import caplogitchange, cappedgd
from .parameter_updates import (pseudo_likelihood_grad, update_haploweights,
                                update_infprobs)
from .relskew import relskew_ratio, relskew_weight

__all__ = ["caplogitchange", "cappedgd", "pseudo_likelihood_grad",
           "update_haploweights", "update_infprobs", "relskew_ratio",
           "relskew_weight"]
