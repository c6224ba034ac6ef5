from .torch_compat import from_reference_state_dict, load_reference_checkpoint  # noqa: F401
