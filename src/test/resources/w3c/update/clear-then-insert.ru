PREFIX : <http://example/>
CLEAR DEFAULT ;
INSERT DATA { :fresh :p 0 }
