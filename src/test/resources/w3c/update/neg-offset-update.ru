PREFIX : <http://example/>
DELETE { ?s :p ?o } WHERE { ?s :p ?o } LIMIT 3
