"""Large-scale data-pipeline operators (north-star extension tier).

- ``dedup``       -- exact, n-gram Jaccard, MinHash+LSH, SimHash
- ``similarity``  -- vector similarity search (brute-force + LSH)
- ``textstats``   -- language-ID, quality scoring, fingerprints
- ``multimodal``  -- binary-column plumbing with pandas-UDF stages
"""
