"""Large-scale data-pipeline operators (north-star extension tier).

- ``dedup``       -- exact, n-gram Jaccard, MinHash+LSH, SimHash
- ``similarity``  -- vector similarity search (brute-force + LSH)
- ``textstats``   -- language-ID, quality scoring, fingerprints
- ``multimodal``  -- binary-column plumbing with pandas-UDF stages

localCheckpoint discipline (ADVICE r14, recorded centrally): the
mid-pipeline ``localCheckpoint(eager=False)`` calls throughout these
operators deduplicate multi-referenced subtrees within ONE query's
lifetime. Their storage blocks are reclaimed by Spark's
ContextCleaner once the returned DataFrame is garbage collected
(bench.py forces a driver ``gc.collect()`` between queries for
exactly this reason); a long-lived interactive session holding many
result frames will accumulate blocks until it drops them.
``localCheckpoint`` data is also executor-local and unrecoverable on
executor loss — acceptable for this engine's local/driver-session
deployment; a multi-tenant cluster deployment should swap the seams
to ``persist``/``unpersist`` pairs or reliable ``checkpoint()``
behind a config.
"""
