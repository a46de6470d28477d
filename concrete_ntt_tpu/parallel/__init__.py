"""Multi-chip parallelism (no reference analogue — SURVEY.md §2.12).

The reference is single-core SIMD; this package supplies the TPU-native
scaling strategies the BASELINE.json north star specifies:

  * `fourstep` — large-N transforms split N = N1×N2 with butterfly stages
    blocked per chip and the inter-pass transpose as `lax.all_to_all` over
    ICI (the transform analogue of sequence parallelism).
  * data-parallel batches: shard the leading batch axis (`batch_axis=` on
    `make_sharded_prime32`, or plain jit sharding on any plan method —
    everything is elementwise or batch-independent).
  * CRT residue channels across chips: channel-leading residue layout
    [k, ..., n] shards naturally; see __graft_entry__.dryrun_multichip for
    the composed dp+sp recipe.
"""

from . import fourstep

__all__ = ["fourstep"]
