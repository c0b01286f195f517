"""Plans: end-to-end pipeline DAG, idempotent materialization, checkpoints."""
