"""Dataset IO: synthetic world generation and (later) rosbag ingestion."""
