"""Host-side I/O: log readers (klg, image directories), synthetic data, exporters."""
