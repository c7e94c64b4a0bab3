from optimalstrategiesagainstgenerativeattacks_tpu.ops.pallas.adain_pallas import (
    ada_in_pallas,
)
from optimalstrategiesagainstgenerativeattacks_tpu.ops.pallas.attention_pallas import (
    self_attention_pallas,
)

__all__ = ["ada_in_pallas", "self_attention_pallas"]
