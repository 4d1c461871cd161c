"""Sources layer: explicit schemas, edge readers, ingest manifest, and
the reference's three pipelines re-expressed as Spark bronze→silver
jobs (SURVEY.md §2.A R1–R20, §7 step 3)."""
