"""Sources: the web-pages carrier table, trajectory reconstruction, and the
reference's SSV point-table format."""
