from .mesh import (  # noqa: F401
    make_mesh,
    pair_sharding,
    replicated,
    align_batch_on_mesh,
    align_batch_mapped_on_mesh,
)
