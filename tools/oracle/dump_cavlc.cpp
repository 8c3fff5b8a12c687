// Dump the reference's encoder-side CAVLC code tables as JSON for fixture use.
#include <cstdio>
#include "residual_tables.h"
extern int RunBeforeCodeTableCoder_length[6][7];
extern unsigned int RunBeforeCodeTableCoder_data_int[6][7];
extern int TotalZerosCodeTableCoder_ChromaDC_length[3][4];
extern unsigned int TotalZerosCodeTableCoder_ChromaDC_data_int[3][4];
extern int TotalZerosCodeTableCoder_4x4_length[15][16];
extern unsigned int TotalZerosCodeTableCoder_4x4_data_int[15][16];
extern int CoeffTokenCodeTableCoder_ChromaDC_length[17][4];
extern unsigned int CoeffTokenCodeTableCoder_ChromaDC_data_int[17][4];
extern int CoeffTokenCodesCoder_nC_8_to_max_length[17][4];
extern unsigned int CoeffTokenCodesCoder_nC_8_to_max_data_int[17][4];
extern int CoeffTokenCodesCoder_nC_4_to_8_length[17][4];
extern unsigned int CoeffTokenCodesCoder_nC_4_to_8_data_int[17][4];
extern int CoeffTokenCodesCoder_nC_2_to_4_length[17][4];
extern unsigned int CoeffTokenCodesCoder_nC_2_to_4_data_int[17][4];
extern int CoeffTokenCodesCoder_nC_0_to_2_length[17][4];
extern unsigned int CoeffTokenCodesCoder_nC_0_to_2_data_int[17][4];

static void dump2(const char* name, int* len, unsigned int* dat, int n0, int n1) {
  printf("\"%s_len\": [", name);
  for (int i=0;i<n0*n1;i++) printf("%d%s", len[i], i==n0*n1-1?"":",");
  printf("],\n\"%s_bits\": [", name);
  for (int i=0;i<n0*n1;i++) printf("%u%s", dat[i], i==n0*n1-1?"":",");
  printf("]");
}
int main() {
  printf("{\n");
  dump2("run_before", &RunBeforeCodeTableCoder_length[0][0], &RunBeforeCodeTableCoder_data_int[0][0], 6, 7); printf(",\n");
  dump2("total_zeros_cdc", &TotalZerosCodeTableCoder_ChromaDC_length[0][0], &TotalZerosCodeTableCoder_ChromaDC_data_int[0][0], 3, 4); printf(",\n");
  dump2("total_zeros_4x4", &TotalZerosCodeTableCoder_4x4_length[0][0], &TotalZerosCodeTableCoder_4x4_data_int[0][0], 15, 16); printf(",\n");
  dump2("ct_cdc", &CoeffTokenCodeTableCoder_ChromaDC_length[0][0], &CoeffTokenCodeTableCoder_ChromaDC_data_int[0][0], 17, 4); printf(",\n");
  dump2("ct_nc0", &CoeffTokenCodesCoder_nC_0_to_2_length[0][0], &CoeffTokenCodesCoder_nC_0_to_2_data_int[0][0], 17, 4); printf(",\n");
  dump2("ct_nc2", &CoeffTokenCodesCoder_nC_2_to_4_length[0][0], &CoeffTokenCodesCoder_nC_2_to_4_data_int[0][0], 17, 4); printf(",\n");
  dump2("ct_nc4", &CoeffTokenCodesCoder_nC_4_to_8_length[0][0], &CoeffTokenCodesCoder_nC_4_to_8_data_int[0][0], 17, 4); printf(",\n");
  dump2("ct_nc8", &CoeffTokenCodesCoder_nC_8_to_max_length[0][0], &CoeffTokenCodesCoder_nC_8_to_max_data_int[0][0], 17, 4);
  printf("\n}\n");
  return 0;
}
