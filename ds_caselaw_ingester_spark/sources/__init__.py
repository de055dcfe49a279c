"""Source operators: table catalog, message-envelope parsing, tar explode."""
