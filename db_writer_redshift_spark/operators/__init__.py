"""Custom operators: merge/upsert, dedup family, similarity search, text
analysis, multimodal column plumbing. All are compositions of DataFrame
built-ins (or Arrow-batched Pandas UDFs where built-ins can't express the
semantics) — no RDDs, no driver-side loops."""
