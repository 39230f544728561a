"""Multi-chip / multi-host parallelism (mesh + halo exchange)."""
from .mesh import make_mesh, shard_batch
from .chunked import (chunked_stft, chunked_cwt, chunked_ssq_cwt,
                      chunked_ssq_stft)

__all__ = ["make_mesh", "shard_batch", "chunked_stft", "chunked_cwt",
           "chunked_ssq_cwt", "chunked_ssq_stft"]
