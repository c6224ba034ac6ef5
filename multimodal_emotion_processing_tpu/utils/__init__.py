from . import initializers  # noqa: F401


def parameter_count(params) -> dict:
    """Total/trainable parameter counts (the reference's
    get_parameter_number, cmu-mosei/run.py:201-204; all params are trainable
    in both frameworks)."""
    import jax

    total = sum(x.size for x in jax.tree_util.tree_leaves(params))
    return {"Total": int(total), "Trainable": int(total)}


def parameter_breakdown(params, depth: int = 2) -> dict:
    """Per-module parameter counts: leaves grouped by the first `depth`
    path segments of their pytree key path (jax's dict-pytree order, i.e.
    sorted keys).  The useful form of the reference's bare total
    (CLI `summary <config>`)."""
    import jax

    out: dict = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        segs = []
        for p in path[:depth]:
            segs.append(str(getattr(p, "key", getattr(p, "idx", p))))
        key = "/".join(segs) or "<root>"
        out[key] = out.get(key, 0) + int(leaf.size)
    return out
