"""Binary sources: fvecs/ivecs readers, index persistence helpers."""

from vector_search_spark.sources.fvecs import (  # noqa: F401
    read_fvecs,
    read_ivecs,
    write_fvecs_local,
)
