from healnet_tpu.compat.torch_import import params_from_torch_state_dict

__all__ = ["params_from_torch_state_dict"]
