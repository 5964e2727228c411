"""Engine operators: E1/E2 parse stage (Arrow UDF), E2 selection + window
geometry (pure Columns), E3 labeling/merge/pivot (pure Columns/Windows),
plus the training-data-pipeline operator family (dedup, similarity, text
stats) over the driver's documents/embeddings tables."""
