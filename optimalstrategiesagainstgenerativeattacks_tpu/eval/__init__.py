from optimalstrategiesagainstgenerativeattacks_tpu.eval.agents import (
    Authenticator,
    Impersonator,
    replay_impersonator,
    rand_source_impersonator,
)
from optimalstrategiesagainstgenerativeattacks_tpu.eval.scorer import (
    comp_acc,
    eval_authenticator_and_impersonator,
    eval_dis_on_multiple_im,
)

__all__ = [
    "Authenticator",
    "Impersonator",
    "replay_impersonator",
    "rand_source_impersonator",
    "comp_acc",
    "eval_authenticator_and_impersonator",
    "eval_dis_on_multiple_im",
]
