PREFIX : <http://example/>
INSERT { _:b :tag ?o } WHERE { :a :p ?o } ;
INSERT { _:b :tag ?o } WHERE { :a :p ?o }
