from ionflux.utils.ptload import pt_load, load_mlp_state_dict

__all__ = ["pt_load", "load_mlp_state_dict"]
