"""Large-scale training-data pipeline operators (SURVEY §2 B-7).

Beyond reference parity: the operations a 100 TB LLM-data pipeline
needs, built Spark-first on the documents/embeddings tables:

- ``dedup``       exact, word-set Jaccard, MinHash+LSH, SimHash;
                  persisted LSH index with snapshot append
                  maintenance (``lsh_index_init/append`` +
                  ``near_dups_against_index``)
- ``similarity``  brute-force cosine top-k; hyperplane-LSH ANN
- ``text``        token counts, quality scoring, language ID,
                  document fingerprinting
- ``multimodal``  opaque binary columns + typed metadata; decode /
                  resize / frame-sample plumbing (stubbed codecs)
"""
