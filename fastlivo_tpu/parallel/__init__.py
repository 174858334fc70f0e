"""Device-mesh parallelism: row-partitioned residual assembly."""
