// dump a parsed sphinx.conf as TYPE\x1FNAME\x1FKEY\x1FIDX\x1FVALUE lines
#include "sphinx.h"
#include "sphinxutils.h"
#include <stdio.h>

int main ( int argc, char ** argv )
{
	if ( argc != 2 ) { printf ( "usage: confdump <file>\n" ); return 2; }
	CSphConfigParser cp;
	if ( !cp.Parse ( argv[1] ) )
	{
		printf ( "PARSE_FAILED\n" );
		return 1;
	}
	CSphConfig & c = cp.m_tConf;
	c.IterateStart ();
	while ( c.IterateNext() )
	{
		CSphString sType = c.IterateGetKey();
		CSphConfigType & t = c.IterateGet();
		t.IterateStart ();
		while ( t.IterateNext() )
		{
			CSphString sName = t.IterateGetKey();
			CSphConfigSection & s = t.IterateGet();
			printf ( "SECTION\x1f%s\x1f%s\n", sType.cstr(), sName.cstr() );
			s.IterateStart ();
			while ( s.IterateNext() )
			{
				CSphString sKey = s.IterateGetKey();
				int i = 0;
				for ( CSphVariant * v = &s.IterateGet(); v; v = v->m_pNext, i++ )
					printf ( "KEY\x1f%s\x1f%s\x1f%s\x1f%d\x1f%s\n",
						sType.cstr(), sName.cstr(), sKey.cstr(), i, v->cstr() ? v->cstr() : "" );
			}
		}
	}
	return 0;
}
