"""neuralsim_tpu — a TPU-native (JAX/XLA/Pallas/pjit) re-design of Neural-Sim.

Neural-Sim ("Learning to Generate Training Data with NeRF", ECCV 2022) is a
bilevel-optimization pipeline: an outer loop optimizes psi, a categorical
distribution over camera poses, so that synthetic images rendered from a
pretrained NeRF at poses sampled from psi — used as training data for a
RetinaNet detector — maximize detector validation accuracy.

This package is a ground-up TPU-first implementation with the same
capabilities as the reference (gyhandy/Neural-Sim-NeRF):

  - ``ops``        pure-functional renderer core (rays, positional encoding,
                   stratified + importance sampling, alpha compositing)
  - ``models``     NeRF MLP (plain pytree params) and the Flax RetinaNet stack
  - ``sampler``    differentiable Gumbel-softmax pose-distribution sampler
  - ``data``       LINEMOD/Blender loaders, PyTorch-checkpoint converter,
                   BOP->NeRF offline converters
  - ``detector``   COCO dataset builder, auto-annotation, inner train loop,
                   mAP evaluation
  - ``hypergrad``  influence-function hypergradient engine (val-grad, HVP,
                   CG/Neumann/one-step inverse-HVP, mixed partials)
  - ``bilevel``    outer-loop driver + psi optimizers
  - ``parallel``   device-mesh / sharding utilities (ICI collectives via XLA)
  - ``kernels``    Pallas TPU kernels for the hot ray-march path
  - ``utils``      config-compatible flag system, checkpointing, profiling

Design stance (vs. the torch/CUDA reference): one differentiable path — pose
sampling and rendering happen once under ``jax.grad``-able code with explicit
PRNG keys, which replaces the reference's render-twice noise-replay protocol
(reference ``optimization/neural_sim_main.py:1180`` vs ``:1200``). Serial
``chunk``/``netchunk`` python loops (reference
``optimization/utils/run_nerf_noscale.py:14-55``) become ``lax.map`` over
statically-shaped ray tiles inside a single jitted program, sharded over a
``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"
