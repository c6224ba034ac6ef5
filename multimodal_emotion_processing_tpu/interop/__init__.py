from .torch_compat import (  # noqa: F401
    from_reference_state_dict, load_reference_checkpoint, to_reference_state_dict)
