PREFIX : <http://example/>
WITH <http://example/g1>
DELETE { ?s :in ?o }
INSERT { ?s :renamed ?o }
WHERE { ?s :in ?o }
