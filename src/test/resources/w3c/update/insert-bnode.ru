PREFIX : <http://example/>
INSERT { ?s :tag [ :v ?p ] } WHERE { ?s :price ?p }
