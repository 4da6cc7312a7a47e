"""Multi-chip parallelism: ICI-sharded NTT and Pippenger MSM.

The reference is single-process (rayon threads inside halo2 only,
SURVEY §2c); the TPU-native scaling axes are sharding the 2^k polynomial
domains and the MSM point streams over a jax.sharding.Mesh, with XLA
collectives (all_to_all / all_gather) riding ICI.
"""
from .ntt_sharded import ntt_sharded, intt_sharded
from .msm_sharded import msm_sharded
from .context import set_prover_mesh, prover_mesh
