"""TPU-native reimplementation of "Optimal Strategies Against Generative Attacks".

A ground-up JAX/Flax/pjit/Pallas framework with the capabilities of the
reference PyTorch code (roymor1/OptimalStrategiesAgainstGenerativeAttacks):
the GIM authentication game on synthetic Gaussians and image datasets
(Omniglot / VoxCeleb2), closed-form theoretic game values, authentication
evaluation against GIM / replay / random-source attackers, and ArcFace /
Siamese baseline authenticators.

Design stance (TPU-first, not a port):
  * All compute paths are pure functions compiled by XLA; the alternating
    G/D adversarial update is a single jitted ``train_step``.
  * Data layout is NHWC (TPU native); matmuls/convs run in configurable
    precision (bfloat16 compute / float32 params by default on TPU).
  * Multi-device scaling uses ``jax.sharding.Mesh`` + NamedSharding
    (data parallel over the ``data`` axis, optional tensor sharding of the
    wide discriminator MLPs over ``model``), not torch DataParallel.
  * Spectral normalisation is explicit state threaded through ``apply``
    (a ``spectral`` variable collection), updated once per optimisation step.
  * Hot composite ops (AdaIN, self-attention over spatial tokens) have
    fused Pallas TPU kernels with jnp fallbacks for CPU testing.

Import alias: ``import optimalstrategiesagainstgenerativeattacks_tpu as osga``.
"""

__version__ = "0.1.0"
