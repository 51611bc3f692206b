"""Multi-chip execution: meshes, data-parallel EM, sequence parallelism.

The reference is strictly single-process NumPy (SURVEY.md §2.4 — no
threading, MPI, or GPU code anywhere); this subsystem is new design, not a
port. Parallelism maps onto a named :class:`jax.sharding.Mesh`:

- ``data``  — utterance batches shard here; Baum-Welch sufficient
  statistics reduce with ``psum`` (the natural parallelism for EM
  training and batch decoding);
- ``seq``   — long utterances chunk along time; the forward recursion's
  associative (N, N) operators compose across chunks with one small
  all-gather (classical ASR's analogue of sequence parallelism);
- ``model`` — GMM mixture components shard here when N*M*D exceeds a
  chip (expert-parallel analogue);
- ``stage`` — streaming pipeline parallelism: AM emission scoring of
  chunk k overlaps the trellis recursion of chunk k-1 on the next
  device (:mod:`lnasr_tpu.parallel.pipeline`).

Collectives are emitted by XLA from ``shard_map``/``psum`` annotations and
ride ICI within a slice, DCN across hosts (``jax.distributed.initialize``
for multi-host bring-up, :mod:`lnasr_tpu.parallel.distributed`).
"""

from lnasr_tpu.parallel.mesh import make_mesh, mesh_shape_for
from lnasr_tpu.parallel.training import (
    make_dp_gmmhmm_em_step,
    make_dp_hmm_em_step,
    make_seq_gmmhmm_em_step,
    make_seq_hmm_em_step,
    train_data_parallel,
    train_seq_parallel,
)
from lnasr_tpu.parallel.seqscan import (
    backward_seq_parallel,
    forward_seq_parallel,
    viterbi_seq_parallel,
)
from lnasr_tpu.parallel.model_parallel import (
    make_mp_emission_fn,
    make_mp_gmmhmm_em_step,
    mp_param_specs,
    train_model_parallel,
)
from lnasr_tpu.parallel.serving import (
    decode_batch_sharded,
    make_dp_decode_step,
)
from lnasr_tpu.parallel.pipeline import (
    make_stage_mesh,
    streaming_pipeline_decode,
    streaming_pipeline_scores,
)

__all__ = [
    "decode_batch_sharded",
    "make_dp_decode_step",
    "make_stage_mesh",
    "streaming_pipeline_decode",
    "streaming_pipeline_scores",
    "make_mesh",
    "mesh_shape_for",
    "make_dp_gmmhmm_em_step",
    "make_dp_hmm_em_step",
    "train_data_parallel",
    "backward_seq_parallel",
    "forward_seq_parallel",
    "make_seq_gmmhmm_em_step",
    "make_seq_hmm_em_step",
    "train_seq_parallel",
    "viterbi_seq_parallel",
    "make_mp_emission_fn",
    "make_mp_gmmhmm_em_step",
    "mp_param_specs",
    "train_model_parallel",
]
