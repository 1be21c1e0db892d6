PREFIX : <http://example/>
DELETE { ?s :p _:x } INSERT { ?s :q 1 } WHERE { ?s :p ?o }
