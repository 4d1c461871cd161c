"""Airflow orchestration layer (BASELINE.json spark_approach:
"DataFrame ops with Airflow orchestration")."""
