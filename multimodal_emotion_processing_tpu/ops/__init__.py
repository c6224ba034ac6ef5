from .attention import scored_attention  # noqa: F401
from .loss import zlpr_loss, symmetric_sigmoid_kl  # noqa: F401
from .context_parallel import cp_context  # noqa: F401
