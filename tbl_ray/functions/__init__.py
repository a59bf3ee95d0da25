"""Training-data pipeline functions beyond the reference's surface:
text analysis, deduplication (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding-cosine), and similarity search. All are Ray-Data-first
batch operators over zero-copy Arrow."""
