PREFIX : <http://example/>
WITH <http://example/g1>
INSERT { :copied :from ?o }
USING <http://example/g2>
WHERE { ?s :in ?o }
