// exprdump — live-differential harness: evaluate a Sphinx expression
// through the REAL sphinxexpr engine over attribute rows from stdin.
// Built by scripts/build_reference.sh; driven by the expression fuzz
// in tests/test_ref_differential.py.
//
//   exprdump "<expr>"
//
// Fixed schema (matches tests/test_expr_fuzz.py): ai int, bi int,
// cb bigint, df float.  stdin rows: "docid weight ai bi cb df".
// Output: first line "TYPE int|bigint|float [WEIGHT]", then one value
// per row — IntEval %d / Int64Eval %lld / Eval float as %.9g.
#include "sphinx.h"
#include "sphinxexpr.h"
#include <stdio.h>
#include <stdlib.h>

int main ( int argc, char ** argv )
{
	if ( argc < 2 )
	{
		printf ( "usage: exprdump <expr>\n" );
		return 2;
	}
	CSphSchema tSchema;
	CSphColumnInfo tCol;
	tCol.m_sName = "ai";	tCol.m_eAttrType = SPH_ATTR_INTEGER;	tSchema.AddAttr ( tCol );
	tCol.m_sName = "bi";	tCol.m_eAttrType = SPH_ATTR_INTEGER;	tSchema.AddAttr ( tCol );
	tCol.m_sName = "cb";	tCol.m_eAttrType = SPH_ATTR_BIGINT;		tSchema.AddAttr ( tCol );
	tCol.m_sName = "df";	tCol.m_eAttrType = SPH_ATTR_FLOAT;		tSchema.AddAttr ( tCol );

	CSphString sError;
	DWORD uType = 0;
	bool bWeight = false;
	ISphExpr * pExpr = sphExprParse ( argv[1], tSchema, &uType, &bWeight, sError );
	if ( !pExpr )
	{
		printf ( "ERROR: %s\n", sError.cstr() );
		return 1;
	}
	const char * sType = ( uType==SPH_ATTR_FLOAT ) ? "float"
		: ( uType==SPH_ATTR_BIGINT ) ? "bigint" : "int";
	printf ( "TYPE %s%s\n", sType, bWeight ? " WEIGHT" : "" );

	CSphMatch tMatch;
	tMatch.Reset ( tSchema.GetRowSize() );

	char sLine [ 1024 ];
	while ( fgets ( sLine, sizeof(sLine), stdin ) )
	{
		long long iDocid, iWeight, iAi, iBi, iCb;
		double fDf;
		if ( sscanf ( sLine, "%lld %lld %lld %lld %lld %lf",
			&iDocid, &iWeight, &iAi, &iBi, &iCb, &fDf ) != 6 )
			continue;
		tMatch.m_iDocID = (SphDocID_t) iDocid;
		tMatch.m_iWeight = (int) iWeight;
		tMatch.SetAttr ( tSchema.GetAttr(0).m_tLocator, (SphAttr_t)(DWORD)(int)iAi );
		tMatch.SetAttr ( tSchema.GetAttr(1).m_tLocator, (SphAttr_t)(DWORD)(int)iBi );
		tMatch.SetAttr ( tSchema.GetAttr(2).m_tLocator, (SphAttr_t)iCb );
		tMatch.SetAttrFloat ( tSchema.GetAttr(3).m_tLocator, (float)fDf );

		if ( uType==SPH_ATTR_FLOAT )
			printf ( "%.9g\n", pExpr->Eval ( tMatch ) );
		else if ( uType==SPH_ATTR_BIGINT )
			printf ( "%lld\n", (long long) pExpr->Int64Eval ( tMatch ) );
		else
			printf ( "%d\n", pExpr->IntEval ( tMatch ) );
	}
	return 0;
}
