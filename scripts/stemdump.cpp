// stemdump — live-differential harness: run words (one per line on
// stdin) through the REAL dictionary morphology (CSphDictCRC
// GetWordID's ApplyStemmers, which mutates the caller's buffer) and
// print each normalized word.  Built by scripts/build_reference.sh;
// driven by the morphology fuzz in tests/test_ref_differential.py.
//
//   stemdump <morphology> [min_stemming_len]
#include "sphinx.h"
#include "sphinxutils.h"
#include <stdio.h>
#include <string.h>
#include <stdlib.h>

int main ( int argc, char ** argv )
{
	if ( argc < 2 )
	{
		printf ( "usage: stemdump morphology [min_stemming_len]\n" );
		return 2;
	}
	CSphString sError;
	CSphTokenizerSettings tTokSettings;
	tTokSettings.m_iType = TOKENIZER_UTF8;
	ISphTokenizer * pTok = ISphTokenizer::Create ( tTokSettings, sError );
	if ( !pTok ) { printf ( "ERROR: %s\n", sError.cstr() ); return 1; }

	CSphDictSettings tDictSettings;
	tDictSettings.m_sMorphology = argv[1];
	if ( argc > 2 )
		tDictSettings.m_iMinStemmingLen = atoi ( argv[2] );
	CSphDict * pDict = sphCreateDictionaryCRC ( tDictSettings, pTok, sError );
	if ( !pDict ) { printf ( "ERROR: %s\n", sError.cstr() ); return 1; }

	char sLine [ 4096 ];
	BYTE sWord [ 16+3*SPH_MAX_WORD_LEN ];
	while ( fgets ( sLine, sizeof(sLine), stdin ) )
	{
		int iLen = strlen ( sLine );
		while ( iLen > 0 && ( sLine[iLen-1]=='\n' || sLine[iLen-1]=='\r' ) )
			sLine[--iLen] = '\0';
		strncpy ( (char*)sWord, sLine, sizeof(sWord)-1 );
		sWord[sizeof(sWord)-1] = '\0';
		pDict->GetWordID ( sWord );
		printf ( "%s\n", sWord );
	}
	return 0;
}
