COPY GRAPH <http://example/g2> TO DEFAULT
