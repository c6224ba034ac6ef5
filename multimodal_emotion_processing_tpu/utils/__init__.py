from . import initializers  # noqa: F401


def parameter_count(params) -> dict:
    """Total/trainable parameter counts (the reference's
    get_parameter_number, cmu-mosei/run.py:201-204; all params are trainable
    in both frameworks)."""
    import jax

    total = sum(x.size for x in jax.tree_util.tree_leaves(params))
    return {"Total": int(total), "Trainable": int(total)}
