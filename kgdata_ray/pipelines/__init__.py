"""End-to-end pipelines + the driver-contract query registry."""
