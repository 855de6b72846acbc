"""Training-data-pipeline operators (dedup, similarity search, text
analysis) and generic relational analytics — each exposed through
``__ray_entry__.queries()`` with a DuckDB oracle where SQL can express
the semantics."""
