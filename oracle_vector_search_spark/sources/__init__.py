"""Sources: file-based scans (binary images, YOLO label files)."""
