PREFIX : <http://example/>
INSERT { ?s :cheap true } WHERE { ?s :price ?v FILTER(?v < 10) }
