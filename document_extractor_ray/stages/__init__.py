"""Ray Data stage functions (vectorized map_batches bodies + the
stateful fallback actor).  All stages are Arrow-in/Arrow-out
(batch_format='pyarrow')."""
