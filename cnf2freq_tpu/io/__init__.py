from .alpha import (load_plantimpute, read_alpha_data, read_alpha_map,
                    read_alpha_ped)

__all__ = ["load_plantimpute", "read_alpha_data", "read_alpha_map",
           "read_alpha_ped"]
