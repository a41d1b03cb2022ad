from .family import FamilyBatch, gather_family
from .emission import emission_all

__all__ = ["FamilyBatch", "gather_family", "emission_all"]
