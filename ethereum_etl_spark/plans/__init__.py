"""Query plans: the driver-harness query registry and the export DAG."""
